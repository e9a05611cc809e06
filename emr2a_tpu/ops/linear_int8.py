"""Streaming W8A8 linear: y = dequant(q(x) @ w_q) + bias.

Serving kernel for the Qwen decoder's seven per-layer projections.
Decode is HBM-bandwidth-bound on the weight stream (measured 665 GB/s
of a 853 GB/s roofline at 2B bf16, docs/PERF_NOTES.md) — int8 weights
halve the bytes, and the s8 x s8 MXU mode doubles the matmul rate for
the prefill (compute-bound) case too.

Activations are quantized per row INSIDE the kernel (VMEM-resident,
fused with the matmul): the float tile streams in once and the s8
copy never touches HBM.  The previous design quantized on the XLA
side first — a separate pass that measured 0.13 ms of a 0.32 ms call
at encoder shapes.  Measured on-chip (scripts/exp_int8_tiles.py, the
(18464,1024)x(1024,1024) encoder shape): fused quantize + full-N
column tiles = 0.28-0.35 ms, vs 0.32 old default, 0.22 old split
path at full-N, and 0.217 ms bf16 XLA — the VPU quantize of a
2048-row tile serializes against the MXU, so at big-T compute-bound
shapes bf16 XLA stays the fast path (docs/PERF_NOTES.md).  Where this
kernel earns its keep is decode/serving (T <= 32): the weight stream
dominates, the in-kernel quantize is free, and one fused call
replaces quantize-pass + kernel dispatch per projection.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_rows(x: jax.Array):
    """(T, K) float -> ((T, K) int8, (T, 1) f32 scales).

    XLA-side reference implementation (the kernel fuses the same math
    in VMEM); kept for tests and for callers that need the quantized
    activations themselves.
    """
    xf = x.astype(jnp.float32)
    a = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(a, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quantize_tile(x_ref):
    xf = x_ref[:, :].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf * (1.0 / xs)), -127, 127).astype(jnp.int8)
    return xq, xs


def _linear_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, *, out_dtype):
    # per-row activation quantize, fused: the float tile is already in
    # VMEM; the s8 copy and the scales are stack temporaries
    xq, xs = _quantize_tile(x_ref)
    acc = jax.lax.dot_general(
        xq, w_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * ws_ref[0, :]
    if b_ref is not None:
        y = y + b_ref[0, :]
    o_ref[:, :] = y.astype(out_dtype)


def _linear_kernel_cached(x_ref, w_ref, ws_ref, b_ref, o_ref,
                          xq_ref, xs_ref, *, out_dtype):
    # Single-row-tile variant (decode/serving: T pads to one tile):
    # with the grid running column tiles, the row quantize would be
    # recomputed per column tile (measured 81 -> 77 tok/s on the 8B
    # decode whose N=12288 projections span many column tiles) — cache
    # the s8 rows + scales in scratch on the first column tile instead.
    @pl.when(pl.program_id(0) == 0)
    def _quantize_once():
        xq, xs = _quantize_tile(x_ref)
        xq_ref[:, :] = xq
        xs_ref[:, :] = xs

    acc = jax.lax.dot_general(
        xq_ref[:, :], w_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs_ref[:, :] * ws_ref[0, :]
    if b_ref is not None:
        y = y + b_ref[0, :]
    o_ref[:, :] = y.astype(out_dtype)


_VMEM_BUDGET = 12 * 2**20  # conservative vs the 16 MiB scoped limit


def _pick_tiles(tp: int, K: int, N: int, tile_n_max: int,
                out_itemsize: int, in_itemsize: int):
    """(tile_t, tile_n) under the VMEM budget.

    Column tiles are as wide as fits (ideally full N): with the grid
    running row tiles innermost, the weight tile is fetched once per
    column group, so a single-column grid streams BOTH operands through
    HBM exactly once — the measured winner at encoder shapes
    (scripts/exp_int8_tiles.py).  Row tiles then grow to amortize
    grid-step overhead.  The model charges double-buffered blocks plus
    the kernel's f32/s8 quantize temporaries (single-buffered stack).
    """
    def vmem(tile_t, tile_n):
        # 6x tile_t*K: f32/s8 quantize stack temporaries plus the
        # single-row-tile xq scratch cache (single-buffered)
        return (2 * (tile_t * K * in_itemsize + K * tile_n
                     + tile_t * tile_n * out_itemsize)
                + 6 * tile_t * K + 12 * tile_n)

    np128 = -(-N // 128) * 128
    tile_n = min(np128, tile_n_max)
    tile_t = min(tp, 1024)
    while vmem(tile_t, tile_n) > _VMEM_BUDGET and tile_t > 256:
        tile_t //= 2
    while vmem(tile_t, tile_n) > _VMEM_BUDGET and tile_n > 128:
        tile_n //= 2
    while vmem(tile_t, tile_n) > _VMEM_BUDGET and tile_t > 32:
        tile_t //= 2
    return tile_t, tile_n


@functools.partial(jax.jit,
                   static_argnames=("tile_n", "out_dtype", "interpret"))
def linear_w8a8(x: jax.Array, w_q: jax.Array, w_scale: jax.Array,
                bias: Optional[jax.Array] = None, tile_n: int = 2048,
                out_dtype=jnp.bfloat16,
                interpret: bool = False) -> jax.Array:
    """x (..., K) float, w_q (K, N) int8, w_scale (N,) f32 -> (..., N).

    T (the flattened leading axis) pads to the row tile (>= the int8
    sublane tile 32); N pads to the weight tile.  Tiles are chosen
    under a VMEM budget (``_pick_tiles``) — full-N column tiles when
    they fit, so each operand streams through HBM once; ``tile_n`` is
    the weight-tile ceiling.  The grid runs column tiles outer / row
    tiles inner, so each weight tile is fetched once and reused across
    every row tile.  Activations are quantized per row in-kernel.
    """
    *lead, K = x.shape
    T = 1
    for n in lead:
        T *= n
    N = w_q.shape[1]
    x2 = x.reshape(T, K)
    in_item = jnp.dtype(x2.dtype).itemsize
    tp32 = -(-T // 32) * 32
    tile_t, tile_n = _pick_tiles(tp32, K, N, tile_n,
                                 jnp.dtype(out_dtype).itemsize, in_item)
    tp = -(-T // tile_t) * tile_t
    np_ = -(-N // tile_n) * tile_n
    x2 = jnp.pad(x2, [(0, tp - T), (0, 0)])
    wq = jnp.pad(w_q, [(0, 0), (0, np_ - N)])
    ws = jnp.pad(w_scale.reshape(1, -1), [(0, 0), (0, np_ - N)])
    operands = [x2, wq, ws]
    # grid = (column tiles, row tiles): i = program_id(0) picks the
    # weight/output column, j = program_id(1) the activation rows.
    in_specs = [
        pl.BlockSpec((tile_t, K), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, tile_n), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    # Single row tile (all serving/decode shapes): quantize once into
    # scratch instead of once per column tile.
    cached = tp == tile_t
    base = _linear_kernel_cached if cached else _linear_kernel
    if bias is not None:
        operands.append(jnp.pad(bias.reshape(1, -1).astype(jnp.float32),
                                [(0, 0), (0, np_ - N)]))
        in_specs.append(pl.BlockSpec((1, tile_n), lambda i, j: (0, i),
                                     memory_space=pltpu.VMEM))
        kernel = functools.partial(base, out_dtype=out_dtype)
    else:
        kernel = functools.partial(
            lambda x_ref, w_ref, ws_ref, o_ref, *scratch, _k=base, **kw:
            _k(x_ref, w_ref, ws_ref, None, o_ref, *scratch, **kw),
            out_dtype=out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(np_ // tile_n, tp // tile_t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_t, tile_n), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, np_), out_dtype),
        scratch_shapes=([pltpu.VMEM((tile_t, K), jnp.int8),
                         pltpu.VMEM((tile_t, 1), jnp.float32)]
                        if cached else []),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * K * np_,
            bytes_accessed=K * np_ + tp * K * in_item + tp * np_,
            transcendentals=0,
        ),
    )(*operands)
    return out[:T, :N].reshape(*lead, N)
