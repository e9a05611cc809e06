"""Streaming W4A8 linear: y = dequant(q8(x) @ unpack4(w_p)) + bias.

Decode at 8B geometry is weight-bandwidth-bound (12.35 ms/token W8A8 =
8.2 GB of int8 weights at 664 GB/s, docs/PERF_NOTES.md) — 4-bit
weights halve the stream again.  The MXU has no s4 mode, so packed
nibbles are expanded to s8 in VMEM (VPU shifts, hidden under the
weight DMA at matvec shapes) and the products run s8 x s8 -> s32.

Quantization is group-wise RTN (``group`` input rows share one f32
scale per output column — the standard 4-bit recipe; per-column-only
scaling measurably degrades real LLM weights).  Packing puts rows
``r`` and ``r + group/2`` of each group in one byte, so a group
unpacks into two contiguous row-blocks and the matmul stays two plain
depth-``group/2`` dots per group — no interleave shuffles on the VPU.

Dual path like linear_int8: serving shapes (T fits one row tile)
quantize in-kernel with the scratch cache; large-T prefill/encoder
shapes stream pre-quantized s8 activations (1 byte/elem, no quantize
temporaries) so tiles stay big.

Serving-only (no VJP).  Used by the Qwen decoder projections via
``models/quantize.quantize_qwen_text_params(precision="int4")``;
matches the serving role of the reference's 8B judge
(/root/reference/encoders/qwen3_vl_8b_thinking_encoder.py:30-43) —
the reference serves bf16 on A100s, this is the TPU-native equivalent
of its memory-bound serving path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from emr2a_tpu.ops.quant import quantize_rows_s8
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight_int4(w, group: int = 128):
    """(K, N) float -> (packed (K//2, N) int8, (K//group, N) f32 scales).

    Group-wise symmetric RTN to the range [-7, 7].  Byte row
    ``g*group/2 + r`` holds (low nibble) original row ``g*group + r``
    and (high nibble) row ``g*group + group/2 + r``.
    """
    w = np.asarray(w, np.float32)
    K, N = w.shape
    if K % group:
        raise ValueError(f"K={K} not divisible by group={group}")
    h = group // 2
    wg = w.reshape(K // group, group, N)
    scale = np.abs(wg).max(axis=1, keepdims=True) / 7.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.rint(wg / scale), -7, 7).astype(np.int8)
    lo = q[:, :h, :]                      # rows r      of each group
    hi = q[:, h:, :]                      # rows h + r  of each group
    packed = ((hi.astype(np.uint8) << 4) | (lo.astype(np.uint8) & 0xF))
    packed = packed.astype(np.int8).reshape(K // 2, N)
    return packed, scale.reshape(K // group, N).astype(np.float32)


def _unpack_nibbles(wp):
    """int8 bytes -> (low, high) s8 values in [-7, 7].

    All bit ops run on i32 — Mosaic's native vector width (i16 shifts
    fail to legalize: 'arith.shrsi' on vector<...xi16>, observed
    on-chip).  Arithmetic shifts sign-extend the high nibble directly;
    the low nibble sign-extends via the <<28 >>28 round trip.
    """
    w32 = wp.astype(jnp.int32)
    high = (w32 >> 4).astype(jnp.int8)
    low = ((w32 << 28) >> 28).astype(jnp.int8)
    return low, high


def _quantize_tile(x_ref):
    return quantize_rows_s8(x_ref[:, :])


def _w4_dot(xq, xs, w_ref, ws_ref, b_ref, o_ref, *,
            out_dtype, group: int, n_groups: int):
    h = group // 2
    y = jnp.zeros((xq.shape[0], o_ref.shape[1]), jnp.float32)
    for g in range(n_groups):
        low, high = _unpack_nibbles(w_ref[g * h:(g + 1) * h, :])
        acc = jax.lax.dot_general(
            xq[:, g * group:g * group + h], low,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc += jax.lax.dot_general(
            xq[:, g * group + h:(g + 1) * group], high,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y + acc.astype(jnp.float32) * ws_ref[g, :]
    y = y * xs
    if b_ref is not None:
        y = y + b_ref[0, :]
    o_ref[:, :] = y.astype(out_dtype)


def _linear_kernel_w4_s8(xq_ref, xs_ref, w_ref, ws_ref, b_ref, o_ref, *,
                         out_dtype, group: int, n_groups: int):
    # Large-T path: activations arrive pre-quantized (s8 + row scales)
    # — 1 byte/elem streamed once per column tile and no in-kernel
    # quantize temporaries, mirroring linear_int8's measured dual-path
    # design (the fused variant re-streamed 2-byte activations and
    # paid the quantize stack per row tile at prefill shapes).
    _w4_dot(xq_ref[:, :], xs_ref[:, :], w_ref, ws_ref, b_ref, o_ref,
            out_dtype=out_dtype, group=group, n_groups=n_groups)


def _linear_kernel_w4_cached(x_ref, w_ref, ws_ref, b_ref, o_ref,
                             xq_ref, xs_ref, *,
                             out_dtype, group: int, n_groups: int):
    # Single-row-tile variant: the grid runs column tiles, so the row
    # quantize is cached in scratch on the first column tile instead of
    # recomputed per tile (same fix as linear_int8, measured there).
    @pl.when(pl.program_id(0) == 0)
    def _quantize_once():
        xq, xs = _quantize_tile(x_ref)
        xq_ref[:, :] = xq
        xs_ref[:, :] = xs

    _w4_dot(xq_ref[:, :], xs_ref[:, :], w_ref, ws_ref, b_ref, o_ref,
            out_dtype=out_dtype, group=group, n_groups=n_groups)


_VMEM_BUDGET = 12 * 2**20
# The streaming (large-T) path's block model misses the group-unrolled
# dot's Mosaic stack — per-group i32 nibble expansion + s32 accumulator
# + the f32 running sum are poorly overlapped across the 32 unrolled
# groups.  Measured on-chip at 8B prefill shapes (K=4096, tiles
# 256x1024): modeled 8.4 MB, actual scoped allocation 16.02 MB against
# the 16 MB limit.  The streaming path therefore budgets against a
# halved limit so the ~2x stack factor still lands under the cap.
_VMEM_BUDGET_S8 = 7 * 2**20


def _pick_tiles_w4(tp: int, K: int, N: int, tile_n_max: int,
                   out_itemsize: int, in_itemsize: int):
    """(tile_t, tile_n, fused) under the VMEM budget.

    Same dual-path model as linear_int8._pick_tiles, with the packed
    weight block at K/2 bytes per column plus the unpack temporaries.
    ``fused`` (in-kernel quantize cached in scratch) only when the
    whole T fits one row tile — the serving shapes; otherwise the
    large-T path streams pre-quantized s8 (1 byte/elem, no quantize
    temporaries), which affords much larger tiles.
    """
    def vmem_fused(tile_t, tile_n):
        # 6x tile_t*K: quantize stack temps + the xq scratch cache;
        # 4x tile_t*tile_n: the f32 group accumulator
        return (2 * (tile_t * K * in_itemsize + K // 2 * tile_n
                     + tile_t * tile_n * out_itemsize)
                + 6 * tile_t * K + 4 * tile_t * tile_n + 16 * tile_n)

    def vmem_s8(tile_t, tile_n):
        return (2 * (tile_t * K + K // 2 * tile_n
                     + tile_t * tile_n * out_itemsize)
                + 4 * tile_t * tile_n + 16 * tile_n + 8 * tile_t)

    from emr2a_tpu.ops.linear_int8 import _halve, _shrink

    np128 = -(-N // 128) * 128
    tn0 = min(np128, tile_n_max)
    if tp <= 1024 and vmem_fused(tp, max(
            128, tn0 // (2 ** 4))) <= _VMEM_BUDGET:
        tile_t, tile_n = tp, tn0
        while vmem_fused(tile_t, tile_n) > _VMEM_BUDGET and tile_n > 128:
            tile_n = _halve(tile_n, 128)
        if vmem_fused(tile_t, tile_n) <= _VMEM_BUDGET:
            return tile_t, tile_n, True
    tile_t, tile_n = _shrink(vmem_s8, min(tp, 2048), tn0,
                             budget=_VMEM_BUDGET_S8)
    return tile_t, tile_n, False


@functools.partial(jax.jit,
                   static_argnames=("tile_n", "out_dtype", "interpret"))
def linear_w4a8(x: jax.Array, w_p: jax.Array, w_scale: jax.Array,
                bias: Optional[jax.Array] = None,
                tile_n: int = 2048, out_dtype=jnp.bfloat16,
                interpret: bool = False) -> jax.Array:
    """x (..., K) float, w_p (K//2, N) packed int4, w_scale
    (K//group, N) f32 -> (..., N).  The group size is inferred as
    ``K // w_scale.shape[0]`` (must be even — the packing pairs rows
    r and r + group/2).

    Grid/tiling contract mirrors ops/linear_int8.linear_w8a8: column
    tiles outer / row tiles inner, full-N column tiles when VMEM
    allows so both operands stream through HBM exactly once;
    activations quantize per row in-kernel.
    """
    *lead, K = x.shape
    if K != 2 * w_p.shape[0]:
        raise ValueError(f"x K={K} vs packed rows {w_p.shape[0]}")
    n_groups = w_scale.shape[0]
    if K % n_groups or (K // n_groups) % 2:
        raise ValueError(f"K={K} not an even multiple of {n_groups} groups")
    group = K // n_groups
    T = 1
    for n in lead:
        T *= n
    N = w_p.shape[1]
    x2 = x.reshape(T, K)
    in_item = jnp.dtype(x2.dtype).itemsize
    tp32 = -(-T // 32) * 32
    tile_t, tile_n, fused = _pick_tiles_w4(
        tp32, K, N, tile_n, jnp.dtype(out_dtype).itemsize, in_item)
    tp = -(-T // tile_t) * tile_t
    np_ = -(-N // tile_n) * tile_n
    x2 = jnp.pad(x2, [(0, tp - T), (0, 0)])
    wp = jnp.pad(w_p, [(0, 0), (0, np_ - N)])
    ws = jnp.pad(w_scale, [(0, 0), (0, np_ - N)])
    if fused:
        operands = [x2]
        in_specs = [pl.BlockSpec((tile_t, K), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM)]
        scratch = [pltpu.VMEM((tile_t, K), jnp.int8),
                   pltpu.VMEM((tile_t, 1), jnp.float32)]
        base = _linear_kernel_w4_cached
    else:
        xq, xs = quantize_rows_s8(x2)
        operands = [xq, xs]
        in_specs = [pl.BlockSpec((tile_t, K), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile_t, 1), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM)]
        scratch = []
        base = _linear_kernel_w4_s8
    operands += [wp, ws]
    in_specs += [
        pl.BlockSpec((K // 2, tile_n), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_groups, tile_n), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    if bias is not None:
        operands.append(jnp.pad(bias.reshape(1, -1).astype(jnp.float32),
                                [(0, 0), (0, np_ - N)]))
        in_specs.append(pl.BlockSpec((1, tile_n), lambda i, j: (0, i),
                                     memory_space=pltpu.VMEM))
        kernel = functools.partial(base, out_dtype=out_dtype,
                                   group=group, n_groups=n_groups)
    elif fused:
        kernel = functools.partial(
            lambda x_ref, w_ref, ws_ref, o_ref, *scratch, **kw:
            _linear_kernel_w4_cached(x_ref, w_ref, ws_ref, None, o_ref,
                                     *scratch, **kw),
            out_dtype=out_dtype, group=group, n_groups=n_groups)
    else:
        kernel = functools.partial(
            lambda xq_ref, xs_ref, w_ref, ws_ref, o_ref, **kw:
            _linear_kernel_w4_s8(xq_ref, xs_ref, w_ref, ws_ref, None,
                                 o_ref, **kw),
            out_dtype=out_dtype, group=group, n_groups=n_groups)
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
            bytes_accessed=(K // 2 * np_
                            + tp * K * (in_item if fused else 1)
                            + tp * np_),
            transcendentals=0,
        ),
    )(*operands)
    return out[:T, :N].reshape(*lead, N)
