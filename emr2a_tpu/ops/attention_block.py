"""Fused LN → QKV → attention → out-proj → residual Pallas kernel.

Companion to ops/mlp.fused_ln_mlp: together they cover a full pre-LN
transformer block with zero inter-op HBM round trips.  Per grid step
the kernel owns `block_b` batch items' full token sequences (encoder
towers attend within an image, so the batch axis tiles cleanly):

    h  = LN1(x)                       f32 statistics
    q/k/v = h @ Wq/Wk/Wv + b          MXU, f32 accum
    per head-group: softmax(q k^T / sqrt(d)) v   (S, S) tile in VMEM
    o  = x + (attn @ Wo + bo)

All four weight matrices are DMA'd HBM→VMEM scratch once on the first
grid step.

Layout: the kernel's HBM I/O runs at ``sq`` rows — the sequence padded
only to sublane (8) alignment — NOT to lane (128) width.  Keys need a
128-multiple ``sp`` only *inside* the logits matmul, so k/v are
projected at sq rows and written into an sp-row VMEM scratch whose tail
rows are zeroed once (then masked to -inf before softmax).  This keeps
every HBM transfer and all four projections at sq rows: for ViT-B
S=197 that is 200 instead of 256 rows — ~22% less I/O and projection
work than a lane-padded layout.

``valid_len`` marks how many rows are real when the caller keeps its
activations pre-padded across layers (models/vit.py fast path pads the
token axis once after the stem instead of pad/slice per layer); rows
beyond it are masked as keys, and their outputs are junk the caller
discards at pooling.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from emr2a_tpu.ops.quant import quantize_rows_s8
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-1e30)

# Working VMEM budget for kernel parameter selection: ~16 MB/core
# physically (probed: 15 MB scratch compiles, 16 MB does not), minus
# headroom for Mosaic's own buffers.
VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def _divisor_at_most(n: int, cap: int) -> int:
    return next(g for g in range(min(cap, n), 0, -1) if n % g == 0)


def fused_attn_vmem_bytes(d: int, S: int, num_heads: int, head_group: int,
                          block_b: int, itemsize: int = 2,
                          weight_itemsize: int = None) -> int:
    """VMEM estimate for one grid step: 4 d×d weight copies, k/v
    pad scratch, the double-buffered in/out batch tiles, and the f32
    logits scratch.

    Models ``merge_batch=False`` only — the merged variant allocates
    ~block_b x the kv/logits scratch plus an extra (block_b*sq, d)
    attn buffer and is experiment-only
    (scripts/exp_layer_breakdown.py); gate merged configs by hand."""
    sq = -(-S // 8) * 8
    sp = -(-sq // 128) * 128
    hg = _divisor_at_most(num_heads, head_group)
    weights = 4 * d * d * (weight_itemsize or itemsize)
    kv_scratch = 2 * sp * d * itemsize
    tiles = 4 * block_b * sq * d * itemsize  # in+out, each double-buffered
    logits = hg * sq * sp * 4
    total = weights + kv_scratch + tiles + logits
    if weight_itemsize == 1:
        # the W8A8 kernel's stack temporaries (s32 accumulators + the
        # per-projection quantized-activation copies) grow with the
        # tile; without this term ViT-L/336 passed the gate and blew
        # the 16 MiB scoped limit by 6 MiB on-chip
        total += block_b * sq * d * 5
    return total


def pick_fused_attn_params(d: int, S: int, num_heads: int,
                           budget: int = VMEM_BUDGET_BYTES,
                           weight_itemsize: int = 2):
    """Largest (block_b, head_group) fitting the VMEM budget, preferring
    batch blocking (more MXU work per grid step) over softmax grouping.
    ``weight_itemsize=1`` for W8A8 params — int8 weight residency is
    half, which lets ViT-L-class shapes fit that bf16 cannot.
    Returns None when even the minimal configuration exceeds VMEM — the
    caller should use the unfused einsum path then."""
    for block_b in (4, 2, 1):
        for head_group in (6, 4, 3, 2, 1):
            hg = _divisor_at_most(num_heads, head_group)
            if fused_attn_vmem_bytes(d, S, num_heads, hg, block_b,
                                     weight_itemsize=weight_itemsize) <= budget:
                return block_b, hg
    return None


def _attn_block_kernel(x_ref, wq_hbm, wk_hbm, wv_hbm, wo_hbm, bq_ref, bk_ref,
                       bv_ref, bo_ref, s_ref, b_ref, o_ref,
                       wq_ref, wk_ref, wv_ref, wo_ref, k_ref, v_ref,
                       logits_ref, sems, *,
                       eps: float, num_heads: int, head_dim: int,
                       valid_len: int, head_group: int, block_b: int,
                       sq: int, sp: int):
    @pl.when(pl.program_id(0) == 0)
    def _load_weights():
        dmas = [pltpu.make_async_copy(src, dst, sems.at[i]) for i, (src, dst)
                in enumerate([(wq_hbm, wq_ref), (wk_hbm, wk_ref),
                              (wv_hbm, wv_ref), (wo_hbm, wo_ref)])]
        for dma in dmas:
            dma.start()
        # Zero the k/v pad rows once; no later step writes them, so
        # they stay zero across the whole grid (masked pre-softmax
        # anyway — the zeroing just keeps the matmul operands defined).
        if sp > sq:
            k_ref[sq:sp, :] = jnp.zeros_like(k_ref[sq:sp, :])
            v_ref[sq:sp, :] = jnp.zeros_like(v_ref[sq:sp, :])
        for dma in dmas:
            dma.wait()

    scale = head_dim ** -0.5
    n_groups = num_heads // head_group
    # additive key mask, one (1, sp) row broadcast onto the logits: a
    # single VPU add per group instead of iota+compare+select passes
    mask_row = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, sp), 1) < valid_len,
        0.0, NEG_INF).astype(jnp.float32)

    for bi in range(block_b):
        x = x_ref[bi, :, :]
        xf = x.astype(jnp.float32)
        mu = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
        h = ((xf - mu) * jax.lax.rsqrt(var + eps)
             * s_ref[0, :].astype(jnp.float32)
             + b_ref[0, :].astype(jnp.float32)).astype(x.dtype)

        def proj(w_ref, bias_ref):
            y = jax.lax.dot_general(
                h, w_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return (y + bias_ref[0, :].astype(jnp.float32)).astype(x.dtype)

        q = proj(wq_ref, bq_ref)
        k_ref[0:sq, :] = proj(wk_ref, bk_ref)
        v_ref[0:sq, :] = proj(wv_ref, bv_ref)

        attn_cols = []
        for g in range(n_groups):
            for j in range(head_group):
                hd = (g * head_group + j) * head_dim
                logits_ref[pl.ds(j * sq, sq), :] = jax.lax.dot_general(
                    q[:, hd:hd + head_dim], k_ref[:, hd:hd + head_dim],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
            logits = logits_ref[:, :]
            if valid_len < sp:
                logits = logits + mask_row
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            for j in range(head_group):
                hd = (g * head_group + j) * head_dim
                attn_cols.append(jax.lax.dot_general(
                    probs[j * sq:(j + 1) * sq, :], v_ref[:, hd:hd + head_dim],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(x.dtype))
        attn = jnp.concatenate(attn_cols, axis=1)

        y = jax.lax.dot_general(
            attn, wo_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y + bo_ref[0, :].astype(jnp.float32)
        o_ref[bi, :, :] = x + y.astype(x.dtype)


def _attn_block_kernel_merged(x_ref, wq_hbm, wk_hbm, wv_hbm, wo_hbm, bq_ref,
                              bk_ref, bv_ref, bo_ref, s_ref, b_ref, o_ref,
                              wq_ref, wk_ref, wv_ref, wo_ref, k_ref, v_ref,
                              logits_ref, attn_ref, sems, *,
                              eps: float, num_heads: int, head_dim: int,
                              valid_len: int, head_group: int, block_b: int,
                              sq: int, sp: int):
    """Merged-batch variant: LN and all four projections run once over
    the whole (block_b*sq, d) tile — M=block_b*sq keeps the MXU row
    dimension full — while the SDPA stays per-item (items attend only
    within themselves).  k/v land in per-item (sp, d) scratch for lane
    alignment."""
    @pl.when(pl.program_id(0) == 0)
    def _load_weights():
        dmas = [pltpu.make_async_copy(src, dst, sems.at[i]) for i, (src, dst)
                in enumerate([(wq_hbm, wq_ref), (wk_hbm, wk_ref),
                              (wv_hbm, wv_ref), (wo_hbm, wo_ref)])]
        for dma in dmas:
            dma.start()
        if sp > sq:
            k_ref[:, sq:sp, :] = jnp.zeros_like(k_ref[:, sq:sp, :])
            v_ref[:, sq:sp, :] = jnp.zeros_like(v_ref[:, sq:sp, :])
        for dma in dmas:
            dma.wait()

    scale = head_dim ** -0.5
    n_groups = num_heads // head_group
    mask_row = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, sp), 1) < valid_len,
        0.0, NEG_INF).astype(jnp.float32)

    M = block_b * sq
    x = x_ref[:, :, :].reshape(M, x_ref.shape[2])
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps)
         * s_ref[0, :].astype(jnp.float32)
         + b_ref[0, :].astype(jnp.float32)).astype(x.dtype)

    def proj(w_ref, bias_ref):
        y = jax.lax.dot_general(
            h, w_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y + bias_ref[0, :].astype(jnp.float32)).astype(x.dtype)

    q = proj(wq_ref, bq_ref)
    k_all = proj(wk_ref, bk_ref)
    v_all = proj(wv_ref, bv_ref)
    for bi in range(block_b):
        k_ref[bi, 0:sq, :] = k_all[bi * sq:(bi + 1) * sq, :]
        v_ref[bi, 0:sq, :] = v_all[bi * sq:(bi + 1) * sq, :]

    # Per-item logits buffers (leading block_b axis) keep each item's
    # logits→softmax→pv chain independent, so Mosaic can overlap item
    # i's VPU softmax with item i+1's MXU matmuls instead of
    # serializing everything through one shared scratch.
    for bi in range(block_b):
        for g in range(n_groups):
            for j in range(head_group):
                hd = (g * head_group + j) * head_dim
                logits_ref[bi, pl.ds(j * sq, sq), :] = jax.lax.dot_general(
                    q[bi * sq:(bi + 1) * sq, hd:hd + head_dim],
                    k_ref[bi, :, hd:hd + head_dim],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
            logits = logits_ref[bi, :, :]
            if valid_len < sp:
                logits = logits + mask_row
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            for j in range(head_group):
                hd = (g * head_group + j) * head_dim
                attn_ref[pl.ds(bi * sq, sq), hd:hd + head_dim] = (
                    jax.lax.dot_general(
                        probs[j * sq:(j + 1) * sq, :],
                        v_ref[bi, :, hd:hd + head_dim],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(x.dtype))

    y = jax.lax.dot_general(
        attn_ref[:, :], wo_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + bo_ref[0, :].astype(jnp.float32)
    o_ref[:, :, :] = (x + y.astype(x.dtype)).reshape(
        block_b, sq, x_ref.shape[2])


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "eps", "head_group", "block_b", "valid_len", "merge_batch",
    "interpret"))
def fused_ln_attention(x: jax.Array, ln_scale, ln_bias, wq, bq, wk, bk,
                       wv, bv, wo, bo, num_heads: int, eps: float = 1e-6,
                       head_group: int = 6, block_b: int = 1,
                       valid_len: Optional[int] = None,
                       merge_batch: bool = False,
                       interpret: bool = False) -> jax.Array:
    """x (B, S, D) -> x + out_proj(attention(LN(x))).

    B pads to a block_b multiple and S to a sublane (8) multiple on the
    host; keys are widened to lane (128) alignment inside the kernel.
    ``valid_len`` (default S) limits which rows act as keys — pass it
    when x rows beyond valid_len are pre-padding kept across layers.
    """
    B, S, d = x.shape
    if d % num_heads:
        raise ValueError(f"hidden {d} not divisible by num_heads {num_heads}")
    if num_heads % head_group:
        # pick the largest divisor of num_heads not exceeding the request
        head_group = next(g for g in range(min(head_group, num_heads), 0, -1)
                          if num_heads % g == 0)
    head_dim = d // num_heads
    if valid_len is None:
        valid_len = S
    sq = -(-S // 8) * 8
    sp = -(-sq // 128) * 128
    b_pad = (-B) % block_b
    xp = jnp.pad(x, [(0, b_pad), (0, sq - S), (0, 0)])
    row = lambda v: v.reshape(1, -1)

    xspec = pl.BlockSpec((block_b, sq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    vec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    if merge_batch:
        kernel = _attn_block_kernel_merged
        kv_shape = (block_b, sp, d)
        logits_shape = (block_b, head_group * sq, sp)
        extra_scratch = [pltpu.VMEM((block_b * sq, d), x.dtype)]
    else:
        kernel = _attn_block_kernel
        kv_shape = (sp, d)
        logits_shape = (head_group * sq, sp)
        extra_scratch = []
    out = pl.pallas_call(
        functools.partial(
            kernel, eps=eps, num_heads=num_heads,
            head_dim=head_dim, valid_len=min(valid_len, S),
            head_group=head_group, block_b=block_b, sq=sq, sp=sp),
        grid=((B + b_pad) // block_b,),
        in_specs=[xspec, hbm, hbm, hbm, hbm, vec, vec, vec, vec, vec, vec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B + b_pad, sq, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((d, d), wq.dtype), pltpu.VMEM((d, d), wk.dtype),
            pltpu.VMEM((d, d), wv.dtype), pltpu.VMEM((d, d), wo.dtype),
            pltpu.VMEM(kv_shape, x.dtype), pltpu.VMEM(kv_shape, x.dtype),
            pltpu.VMEM(logits_shape, jnp.float32),
        ] + extra_scratch + [
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=B * (8 * sq * d * d + 4 * sq * sp * d),
            bytes_accessed=(2 * B * sq * d + 4 * d * d) * x.dtype.itemsize,
            transcendentals=B * num_heads * sq * sp,
        ),
    )(xp, wq, wk, wv, wo, row(bq), row(bk), row(bv), row(bo),
      row(ln_scale), row(ln_bias))
    return out[:B, :S]


# ---------------------------------------------------------------------------
# int8 (W8A8) projection variant
# ---------------------------------------------------------------------------
#
# Projections (the 8/9ths of this kernel's FLOPs that are plain h@W)
# run as s8 x s8 -> s32 MXU products — ~2x the bf16 rate on v5e
# (scripts/exp_roofline.py --what int8) — with f32 rescale; the SDPA
# (softmax numerics) stays bf16.  Weights quantized per output column
# offline (ops/mlp.quantize_weight_int8); LN output / attn rows are
# dynamically quantized per row.


def _quantize_rows_i8(h):
    return quantize_rows_s8(h)


def _attn_block_kernel_i8(x_ref, wq_hbm, wk_hbm, wv_hbm, wo_hbm,
                          sq_ref, sk_ref, sv_ref, so_ref,
                          bq_ref, bk_ref, bv_ref, bo_ref, s_ref, b_ref,
                          o_ref, wq_ref, wk_ref, wv_ref, wo_ref, k_ref,
                          v_ref, logits_ref, sems, *,
                          eps: float, num_heads: int, head_dim: int,
                          valid_len: int, head_group: int, block_b: int,
                          sq: int, sp: int):
    @pl.when(pl.program_id(0) == 0)
    def _load_weights():
        dmas = [pltpu.make_async_copy(src, dst, sems.at[i]) for i, (src, dst)
                in enumerate([(wq_hbm, wq_ref), (wk_hbm, wk_ref),
                              (wv_hbm, wv_ref), (wo_hbm, wo_ref)])]
        for dma in dmas:
            dma.start()
        if sp > sq:
            k_ref[sq:sp, :] = jnp.zeros_like(k_ref[sq:sp, :])
            v_ref[sq:sp, :] = jnp.zeros_like(v_ref[sq:sp, :])
        for dma in dmas:
            dma.wait()

    scale = head_dim ** -0.5
    n_groups = num_heads // head_group
    mask_row = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, sp), 1) < valid_len,
        0.0, NEG_INF).astype(jnp.float32)

    for bi in range(block_b):
        x = x_ref[bi, :, :]
        xf = x.astype(jnp.float32)
        mu = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
        h = ((xf - mu) * jax.lax.rsqrt(var + eps)
             * s_ref[0, :].astype(jnp.float32)
             + b_ref[0, :].astype(jnp.float32))
        hq, hscale = _quantize_rows_i8(h)

        def proj(w_ref, col_ref, bias_ref):
            acc = jax.lax.dot_general(
                hq, w_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32) * hscale * col_ref[0, :]
                 + bias_ref[0, :].astype(jnp.float32))
            return y.astype(x.dtype)

        q = proj(wq_ref, sq_ref, bq_ref)
        k_ref[0:sq, :] = proj(wk_ref, sk_ref, bk_ref)
        v_ref[0:sq, :] = proj(wv_ref, sv_ref, bv_ref)

        attn_cols = []
        for g in range(n_groups):
            for j in range(head_group):
                hd = (g * head_group + j) * head_dim
                logits_ref[pl.ds(j * sq, sq), :] = jax.lax.dot_general(
                    q[:, hd:hd + head_dim], k_ref[:, hd:hd + head_dim],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
            logits = logits_ref[:, :]
            if valid_len < sp:
                logits = logits + mask_row
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            for j in range(head_group):
                hd = (g * head_group + j) * head_dim
                attn_cols.append(jax.lax.dot_general(
                    probs[j * sq:(j + 1) * sq, :], v_ref[:, hd:hd + head_dim],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
        attn = jnp.concatenate(attn_cols, axis=1)
        aq, ascale = _quantize_rows_i8(attn)
        acc = jax.lax.dot_general(
            aq, wo_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * ascale * so_ref[0, :]
             + bo_ref[0, :].astype(jnp.float32))
        o_ref[bi, :, :] = x + y.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "eps", "head_group", "block_b", "valid_len", "interpret"))
def fused_ln_attention_int8(x: jax.Array, ln_scale, ln_bias,
                            wq_q, wq_s, bq, wk_q, wk_s, bk,
                            wv_q, wv_s, bv, wo_q, wo_s, bo,
                            num_heads: int, eps: float = 1e-6,
                            head_group: int = 6, block_b: int = 1,
                            valid_len: Optional[int] = None,
                            interpret: bool = False) -> jax.Array:
    """W8A8 variant of :func:`fused_ln_attention` — same contract, with
    int8 weights + (1, d) column scales from
    ops/mlp.quantize_weight_int8 for each projection."""
    B, S, d = x.shape
    if d % num_heads:
        raise ValueError(f"hidden {d} not divisible by num_heads {num_heads}")
    if num_heads % head_group:
        head_group = next(g for g in range(min(head_group, num_heads), 0, -1)
                          if num_heads % g == 0)
    head_dim = d // num_heads
    if valid_len is None:
        valid_len = S
    sq = -(-S // 8) * 8
    sp = -(-sq // 128) * 128
    b_pad = (-B) % block_b
    xp = jnp.pad(x, [(0, b_pad), (0, sq - S), (0, 0)])
    row = lambda v: v.reshape(1, -1)

    xspec = pl.BlockSpec((block_b, sq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    vec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _attn_block_kernel_i8, eps=eps, num_heads=num_heads,
            head_dim=head_dim, valid_len=min(valid_len, S),
            head_group=head_group, block_b=block_b, sq=sq, sp=sp),
        grid=((B + b_pad) // block_b,),
        in_specs=[xspec, hbm, hbm, hbm, hbm] + [vec] * 10,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B + b_pad, sq, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((d, d), jnp.int8), pltpu.VMEM((d, d), jnp.int8),
            pltpu.VMEM((d, d), jnp.int8), pltpu.VMEM((d, d), jnp.int8),
            pltpu.VMEM((sp, d), x.dtype), pltpu.VMEM((sp, d), x.dtype),
            pltpu.VMEM((head_group * sq, sp), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=B * (8 * sq * d * d + 4 * sq * sp * d),
            bytes_accessed=2 * B * sq * d * x.dtype.itemsize + 4 * d * d,
            transcendentals=B * num_heads * sq * sp,
        ),
    )(xp, wq_q, wk_q, wv_q, wo_q,
      row(wq_s), row(wk_s), row(wv_s), row(wo_s),
      row(bq), row(bk), row(bv), row(bo), row(ln_scale), row(ln_bias))
    return out[:B, :S]
