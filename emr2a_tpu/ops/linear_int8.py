"""Streaming W8A8 linear: y = dequant(q(x) @ w_q) + bias.

Serving kernel for the Qwen decoder's seven per-layer projections.
Decode is HBM-bandwidth-bound on the weight stream (measured 665 GB/s
of a 853 GB/s roofline at 2B bf16, docs/PERF_NOTES.md) — int8 weights
halve the bytes, and the s8 x s8 MXU mode doubles the matmul rate for
the prefill (compute-bound) case too.

The activation is quantized per row ONCE on the XLA side (not per
weight tile); the kernel streams (K, tile_n) int8 weight blocks
through VMEM double-buffered by the pipeline and emits bf16.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_rows(x: jax.Array):
    """(T, K) float -> ((T, K) int8, (T, 1) f32 scales)."""
    xf = x.astype(jnp.float32)
    a = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(a, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _linear_kernel(xq_ref, xs_ref, w_ref, ws_ref, b_ref, o_ref, *,
                   out_dtype):
    acc = jax.lax.dot_general(
        xq_ref[:, :], w_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs_ref[:, :] * ws_ref[0, :]
    if b_ref is not None:
        y = y + b_ref[0, :]
    o_ref[:, :] = y.astype(out_dtype)


_VMEM_BUDGET = 12 * 2**20  # conservative vs the 16 MiB scoped limit


def _pick_tiles(tp: int, K: int, tile_n_max: int, out_itemsize: int):
    """(tile_t, tile_n) under the VMEM budget (double-buffered blocks).

    Grid-step overhead on this hardware is ~5-10 us, so row tiles are
    grown as large as the budget allows (up to 2048) — encoder shapes
    (T in the tens of thousands) at a 256-row tile paid more in step
    overhead than the int8 byte saving earned back.  Decode (tp <= the
    cap) keeps one row tile so weights stream through exactly once.
    When it still doesn't fit, shrink the weight tile first (big-T
    callers are compute-bound; narrower N tiles are free), then rows.
    """
    def vmem(tile_t, tile_n):
        return 2 * (tile_t * K + K * tile_n
                    + tile_t * tile_n * out_itemsize) + 12 * tile_n

    tile_t, tile_n = min(tp, 2048), tile_n_max
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
                bias: Optional[jax.Array] = None, tile_n: int = 512,
                out_dtype=jnp.bfloat16,
                interpret: bool = False) -> jax.Array:
    """x (..., K) float, w_q (K, N) int8, w_scale (N,) f32 -> (..., N).

    T (the flattened leading axis) pads to the row tile (>= the int8
    sublane tile 32); N pads to the weight tile.  Tiles are chosen
    under a VMEM budget (``_pick_tiles``), so encoder-sized activations
    (e.g. BERT batch x 256 tokens) and 8B-geometry prefill both fit;
    ``tile_n`` is the weight-tile ceiling.  The grid runs column tiles
    outer / row tiles inner, so each weight tile is fetched once and
    reused across every row tile.
    """
    *lead, K = x.shape
    T = 1
    for n in lead:
        T *= n
    N = w_q.shape[1]
    tp32 = -(-T // 32) * 32
    tile_t, tile_n = _pick_tiles(tp32, K, tile_n,
                                 jnp.dtype(out_dtype).itemsize)
    xq, xs = quantize_rows(x.reshape(T, K))
    tp = -(-T // tile_t) * tile_t
    np_ = -(-N // tile_n) * tile_n
    xq = jnp.pad(xq, [(0, tp - T), (0, 0)])
    xs = jnp.pad(xs, [(0, tp - T), (0, 0)])
    wq = jnp.pad(w_q, [(0, 0), (0, np_ - N)])
    ws = jnp.pad(w_scale.reshape(1, -1), [(0, 0), (0, np_ - N)])
    operands = [xq, xs, wq, ws]
    # grid = (column tiles, row tiles): i = program_id(0) picks the
    # weight/output column, j = program_id(1) the activation rows.
    in_specs = [
        pl.BlockSpec((tile_t, K), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_t, 1), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
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
        kernel = functools.partial(_linear_kernel, out_dtype=out_dtype)
    else:
        kernel = functools.partial(
            lambda xq_ref, xs_ref, w_ref, ws_ref, o_ref, out_dtype:
            _linear_kernel(xq_ref, xs_ref, w_ref, ws_ref, None, o_ref,
                           out_dtype=out_dtype), out_dtype=out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(np_ // tile_n, tp // tile_t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_t, tile_n), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, np_), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * tp * K * np_,
            bytes_accessed=K * np_ + tp * K,
            transcendentals=0,
        ),
    )(*operands)
    return out[:T, :N].reshape(*lead, N)
