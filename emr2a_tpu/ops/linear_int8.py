"""Streaming W8A8 linear: y = dequant(q(x) @ w_q) + bias.

Serving kernel for the Qwen decoder's per-layer projections.  Decode
is HBM-bandwidth-bound on the weight stream (measured 634-665 GB/s of
a 853 GB/s roofline at 8B/2B geometry, docs/PERF_NOTES.md) — int8
weights halve the bytes, and the s8 x s8 MXU mode doubles the matmul
rate for the prefill (compute-bound) case too.

Two activation-quantize strategies, chosen by shape (measured on-chip,
scripts/exp_int8_tiles.py + the 8B prefill/decode A/Bs):

- **Serving (T fits one row tile)**: quantize per row INSIDE the
  kernel, cached in VMEM scratch on the first column tile — the float
  tile streams in once, the s8 copy never touches HBM, and one fused
  call replaces quantize-pass + kernel dispatch per projection.
- **Large T (prefill / encoder fallback)**: quantize via one XLA pass
  (``quantize_rows``), then stream the s8 activations.  In-kernel
  quantize at large row tiles allocates ~6x tile_t*K of f32/s8 stack
  temporaries, forcing tiny tiles that cost more than the extra HBM
  round-trip saves (measured: 8B prefill 131 -> 162 ms, encoder-shape
  call 0.22 -> 0.28-0.35 ms when forced through the fused path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from emr2a_tpu.ops.quant import quantize_rows_s8
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_rows(x: jax.Array):
    """(T, K) float -> ((T, K) int8, (T, 1) f32 scales).

    The XLA-side quantize pass of the large-T path; the kernels fuse
    the SAME function (ops/quant.quantize_rows_s8) in VMEM for the
    serving path, so both paths emit identical codes."""
    return quantize_rows_s8(x)


def _quantize_tile(x_ref):
    return quantize_rows_s8(x_ref[:, :])


def _s8_dot(xq, xs, w_ref, ws_ref, b_ref, o_ref, *, out_dtype):
    acc = jax.lax.dot_general(
        xq, w_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * ws_ref[0, :]
    if b_ref is not None:
        y = y + b_ref[0, :]
    o_ref[:, :] = y.astype(out_dtype)


def _kernel_fused(x_ref, w_ref, ws_ref, b_ref, o_ref, xq_ref, xs_ref, *,
                  out_dtype):
    # Serving path: T pads to ONE row tile; with the grid running
    # column tiles, quantize once into scratch on the first tile
    # instead of per column tile (the redundancy measurably cost
    # tok/s on the 8B decode whose N=12288 spans many tiles).
    @pl.when(pl.program_id(0) == 0)
    def _quantize_once():
        xq, xs = _quantize_tile(x_ref)
        xq_ref[:, :] = xq
        xs_ref[:, :] = xs

    _s8_dot(xq_ref[:, :], xs_ref[:, :], w_ref, ws_ref, b_ref, o_ref,
            out_dtype=out_dtype)


def _kernel_s8(xq_ref, xs_ref, w_ref, ws_ref, b_ref, o_ref, *, out_dtype):
    # Large-T path: activations arrive pre-quantized (s8 + row scales).
    _s8_dot(xq_ref[:, :], xs_ref[:, :], w_ref, ws_ref, b_ref, o_ref,
            out_dtype=out_dtype)


_VMEM_BUDGET = 12 * 2**20  # conservative vs the 16 MiB scoped limit


def _halve(tile: int, align: int) -> int:
    """Halve, then round back UP to the alignment the kernel contract
    requires (int8 sublane 32 for rows, lane 128 for columns): plain
    halving of a non-power-of-two start (e.g. a 1504-row prompt tile)
    emits misaligned tiles that Mosaic rejects.  Strictly decreasing
    for any aligned tile > align."""
    return max(align, -(-(tile // 2) // align) * align)


def _shrink(vmem, tile_t, tile_n, budget=_VMEM_BUDGET):
    while vmem(tile_t, tile_n) > budget and tile_t > 256:
        tile_t = _halve(tile_t, 32)
    while vmem(tile_t, tile_n) > budget and tile_n > 128:
        tile_n = _halve(tile_n, 128)
    while vmem(tile_t, tile_n) > budget and tile_t > 32:
        tile_t = _halve(tile_t, 32)
    return tile_t, tile_n


def _pick_tiles(tp: int, K: int, N: int, tile_n_max: int,
                out_itemsize: int, in_itemsize: int):
    """(tile_t, tile_n, fused) under the VMEM budget.

    Column tiles are as wide as fits (ideally full N): with the grid
    running column tiles, the weight tile is fetched once per column
    group, so a single-column grid streams BOTH operands through HBM
    exactly once — the measured winner at encoder shapes
    (scripts/exp_int8_tiles.py).

    ``fused`` (in-kernel quantize + scratch cache) only when the whole
    T fits one row tile — its model charges the f32/s8 quantize
    temporaries and the xq scratch (~6x tile_t*K, single-buffered).
    Otherwise the large-T path streams pre-quantized s8 (1 byte/elem,
    no temporaries), which affords much larger tiles.
    """
    def vmem_fused(tile_t, tile_n):
        return (2 * (tile_t * K * in_itemsize + K * tile_n
                     + tile_t * tile_n * out_itemsize)
                + 6 * tile_t * K + 12 * tile_n)

    def vmem_s8(tile_t, tile_n):
        return (2 * (tile_t * K + K * tile_n
                     + tile_t * tile_n * out_itemsize)
                + 12 * tile_n + 8 * tile_t)

    np128 = -(-N // 128) * 128
    tn0 = min(np128, tile_n_max)
    if tp <= 1024 and vmem_fused(tp, max(
            128, tn0 // (2 ** 4))) <= _VMEM_BUDGET:
        # serving-scale T: try to keep one row tile so the fused path
        # applies; shrink columns first
        tile_t, tile_n = tp, tn0
        while vmem_fused(tile_t, tile_n) > _VMEM_BUDGET and tile_n > 128:
            tile_n = _halve(tile_n, 128)
        if vmem_fused(tile_t, tile_n) <= _VMEM_BUDGET:
            return tile_t, tile_n, True
    tile_t, tile_n = _shrink(vmem_s8, min(tp, 2048), tn0)
    return tile_t, tile_n, False


@functools.partial(jax.jit,
                   static_argnames=("tile_n", "out_dtype", "interpret"))
def linear_w8a8(x: jax.Array, w_q: jax.Array, w_scale: jax.Array,
                bias: Optional[jax.Array] = None, tile_n: int = 2048,
                out_dtype=jnp.bfloat16,
                interpret: bool = False) -> jax.Array:
    """x (..., K) float, w_q (K, N) int8, w_scale (N,) f32 -> (..., N).

    T (the flattened leading axis) pads to the row tile (>= the int8
    sublane tile 32); N pads to the weight tile.  Tiles and the
    quantize strategy are chosen under a VMEM budget (``_pick_tiles``)
    — full-N column tiles when they fit, so each operand streams
    through HBM once; ``tile_n`` is the weight-tile ceiling.  The grid
    runs column tiles outer / row tiles inner, so each weight tile is
    fetched once and reused across every row tile.
    """
    *lead, K = x.shape
    T = 1
    for n in lead:
        T *= n
    N = w_q.shape[1]
    x2 = x.reshape(T, K)
    in_item = jnp.dtype(x2.dtype).itemsize
    tp32 = -(-T // 32) * 32
    tile_t, tile_n, fused = _pick_tiles(
        tp32, K, N, tile_n, jnp.dtype(out_dtype).itemsize, in_item)
    tp = -(-T // tile_t) * tile_t
    np_ = -(-N // tile_n) * tile_n
    x2 = jnp.pad(x2, [(0, tp - T), (0, 0)])
    wq = jnp.pad(w_q, [(0, 0), (0, np_ - N)])
    ws = jnp.pad(w_scale.reshape(1, -1), [(0, 0), (0, np_ - N)])

    # grid = (column tiles, row tiles): i = program_id(0) picks the
    # weight/output column, j = program_id(1) the activation rows.
    if fused:
        operands = [x2]
        in_specs = [pl.BlockSpec((tile_t, K), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM)]
        scratch = [pltpu.VMEM((tile_t, K), jnp.int8),
                   pltpu.VMEM((tile_t, 1), jnp.float32)]
        base = _kernel_fused
    else:
        xq, xs = quantize_rows(x2)
        operands = [xq, xs]
        in_specs = [pl.BlockSpec((tile_t, K), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile_t, 1), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM)]
        scratch = []
        base = _kernel_s8
    operands += [wq, ws]
    in_specs += [
        pl.BlockSpec((K, tile_n), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    if bias is not None:
        operands.append(jnp.pad(bias.reshape(1, -1).astype(jnp.float32),
                                [(0, 0), (0, np_ - N)]))
        in_specs.append(pl.BlockSpec((1, tile_n), lambda i, j: (0, i),
                                     memory_space=pltpu.VMEM))
        kernel = functools.partial(base, out_dtype=out_dtype)
    else:
        if fused:
            kernel = functools.partial(
                lambda x_ref, w_ref, ws_ref, o_ref, *s, **kw:
                _kernel_fused(x_ref, w_ref, ws_ref, None, o_ref, *s, **kw),
                out_dtype=out_dtype)
        else:
            kernel = functools.partial(
                lambda xq_ref, xs_ref, w_ref, ws_ref, o_ref, **kw:
                _kernel_s8(xq_ref, xs_ref, w_ref, ws_ref, None, o_ref,
                           **kw),
                out_dtype=out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(np_ // tile_n, tp // tile_t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_t, tile_n), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, np_), out_dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * K * np_,
            bytes_accessed=K * np_ + tp * K * (in_item if fused else 1)
            + tp * np_,
            transcendentals=0,
        ),
    )(*operands)
    return out[:T, :N].reshape(*lead, N)
