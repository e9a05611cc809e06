"""Fused LayerNorm → MLP → residual Pallas kernel.

The transformer MLP's (tokens, mlp_dim) intermediate is the single
largest activation tensor: for ViT-B at batch 256 it is ~310 MB
written + read back per layer (~7.5 GB per forward) purely because XLA
must materialize it between the two matmuls.  This kernel tiles over
tokens, keeps both weight matrices VMEM-resident across grid steps and
the intermediate entirely on-chip, so per-layer HBM traffic drops to
x-in + y-out + weights-once.

Math parity: y = x + fc2(gelu(fc1(LN(x)))) with f32 LN statistics and
f32 MXU accumulation — identical (to bf16 rounding) to the unfused
TransformerBlock MLP half.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from emr2a_tpu.ops.quant import quantize_rows_s8
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emr2a_tpu.models.layers import ACTIVATIONS

# Mosaic has no erf lowering, so exact gelu maps to the tanh
# approximation inside the kernel (|Δ| ≲ 3e-4 on typical activations —
# callers wanting bitwise-exact gelu keep the unfused path).
_KERNEL_ACTIVATIONS = {
    **ACTIVATIONS,
    "gelu": lambda x: jax.nn.gelu(x, approximate=True),
}


def _mlp_kernel(x_ref, w1_hbm, b1_ref, w2_hbm, b2_ref, s_ref, b_ref, o_ref,
                w1_ref, w2_ref, sems, *, eps: float, activation: str,
                act_dtype):
    # Weights are DMA'd HBM->VMEM scratch ONCE (first grid step) and
    # reused across all token tiles — keeping them as pipelined input
    # blocks would double-buffer ~19 MB and blow VMEM.
    @pl.when(pl.program_id(0) == 0)
    def _load_weights():
        w1_dma = pltpu.make_async_copy(w1_hbm, w1_ref, sems.at[0])
        w2_dma = pltpu.make_async_copy(w2_hbm, w2_ref, sems.at[1])
        w1_dma.start()
        w2_dma.start()
        w1_dma.wait()
        w2_dma.wait()

    x = x_ref[:, :]
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps)
         * s_ref[0, :].astype(jnp.float32)
         + b_ref[0, :].astype(jnp.float32)).astype(x.dtype)
    h1 = jax.lax.dot_general(
        h, w1_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h1 = (h1 + b1_ref[0, :].astype(jnp.float32)).astype(act_dtype)
    h1 = _KERNEL_ACTIVATIONS[activation](h1).astype(x.dtype)
    y = jax.lax.dot_general(
        h1, w2_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + b2_ref[0, :].astype(jnp.float32)
    o_ref[:, :] = x + y.astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "activation", "tile", "act_dtype",
                                    "interpret"))
def fused_ln_mlp(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                 w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
                 eps: float = 1e-6, activation: str = "gelu",
                 tile: int = 512, act_dtype=jnp.float32,
                 interpret: bool = False) -> jax.Array:
    """x (T, d) -> x + MLP(LN(x)).  T padded to the token tile; weights
    (d, m) and (m, d) stay VMEM-resident across grid steps.

    ``act_dtype``: precision the activation function is evaluated in;
    bf16 halves the VPU transcendental work (per-layer output cosine
    vs f32 >= 0.99999 at ViT-B scales — measured in scripts/)."""
    T, d = x.shape
    m = w1.shape[1]
    tp = -(-T // tile) * tile
    xp = jnp.pad(x, [(0, tp - T), (0, 0)])
    # 2D (1, n) layout for vector params (TPU scalars/vectors want 2D).
    row = lambda v: v.reshape(1, -1)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps, activation=activation,
                          act_dtype=act_dtype),
        grid=(tp // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # w1 stays in HBM
            const((1, m)),
            pl.BlockSpec(memory_space=pl.ANY),   # w2 stays in HBM
            const((1, d)), const((1, d)), const((1, d)),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((d, m), w1.dtype),
            pltpu.VMEM((m, d), w2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * tp * d * m,
            bytes_accessed=(2 * tp * d + 2 * d * m) * x.dtype.itemsize,
            transcendentals=tp * m,
        ),
    )(xp, w1, row(b1), w2, row(b2), row(ln_scale), row(ln_bias))
    return out[:T]


# ---------------------------------------------------------------------------
# int8 (W8A8) variant
# ---------------------------------------------------------------------------
#
# The v5e MXU runs s8 x s8 -> s32 at ~2x the bf16 rate at these shapes
# (426 vs 222 TF/s measured, scripts/exp_roofline.py --what int8), and
# the tower is MXU-pass-bound (docs/PERF_NOTES.md roofline) — so W8A8
# matmuls with f32 rescale are the headroom bf16 cannot reach.
# Weights are quantized per output column offline; activations per row
# on the fly inside the kernel (dynamic symmetric quantization).

def quantize_weight_int8(w) -> tuple:
    """(K, N) float weights -> (int8 weights, (1, N) f32 column scales)."""
    import numpy as _np
    w = _np.asarray(w, _np.float32)
    scale = _np.abs(w).max(axis=0, keepdims=True) / 127.0
    scale = _np.maximum(scale, 1e-12)
    q = _np.clip(_np.rint(w / scale), -127, 127).astype(_np.int8)
    return q, scale.astype(_np.float32)


def _quantize_rows(h):
    """f32 (rows, cols) -> (int8 values, (rows, 1) f32 scales)."""
    return quantize_rows_s8(h)


def _mlp_kernel_int8(x_ref, w1_hbm, s1_ref, b1_ref, w2_hbm, s2_ref, b2_ref,
                     s_ref, b_ref, o_ref, w1_ref, w2_ref, sems, *,
                     eps: float, activation: str, act_dtype):
    @pl.when(pl.program_id(0) == 0)
    def _load_weights():
        w1_dma = pltpu.make_async_copy(w1_hbm, w1_ref, sems.at[0])
        w2_dma = pltpu.make_async_copy(w2_hbm, w2_ref, sems.at[1])
        w1_dma.start()
        w2_dma.start()
        w1_dma.wait()
        w2_dma.wait()

    x = x_ref[:, :]
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps)
         * s_ref[0, :].astype(jnp.float32)
         + b_ref[0, :].astype(jnp.float32))

    q, xscale = _quantize_rows(h)
    acc = jax.lax.dot_general(
        q, w1_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    h1 = (acc.astype(jnp.float32) * xscale * s1_ref[0, :]
          + b1_ref[0, :])
    # bf16 act_dtype halves the VPU transcendental cost (same knob as
    # the bf16 kernel; quantize stays f32 for exact scales)
    h1 = _KERNEL_ACTIVATIONS[activation](
        h1.astype(act_dtype)).astype(jnp.float32)

    q2, x2scale = _quantize_rows(h1)
    acc2 = jax.lax.dot_general(
        q2, w2_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = (acc2.astype(jnp.float32) * x2scale * s2_ref[0, :]
         + b2_ref[0, :])
    o_ref[:, :] = x + y.astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "activation", "tile", "act_dtype",
                                    "interpret"))
def fused_ln_mlp_int8(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
                      w1_q: jax.Array, w1_scale: jax.Array, b1: jax.Array,
                      w2_q: jax.Array, w2_scale: jax.Array, b2: jax.Array,
                      eps: float = 1e-6, activation: str = "gelu",
                      tile: int = 256, act_dtype=jnp.float32,
                      interpret: bool = False) -> jax.Array:
    """x (T, d) -> x + MLP(LN(x)) with W8A8 int8 matmuls.

    ``w*_q`` int8 from :func:`quantize_weight_int8`, ``w*_scale`` the
    (1, N) column scales.  Activations are dynamically quantized per
    row; both MXU products accumulate s32 and rescale in f32.
    """
    T, d = x.shape
    m = w1_q.shape[1]
    tp = -(-T // tile) * tile
    xp = jnp.pad(x, [(0, tp - T), (0, 0)])
    row = lambda v: v.reshape(1, -1)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel_int8, eps=eps, activation=activation,
                          act_dtype=act_dtype),
        grid=(tp // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # w1 int8 in HBM
            const((1, m)), const((1, m)),
            pl.BlockSpec(memory_space=pl.ANY),   # w2 int8 in HBM
            const((1, d)), const((1, d)),
            const((1, d)), const((1, d)),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((d, m), jnp.int8),
            pltpu.VMEM((m, d), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * tp * d * m,
            bytes_accessed=2 * tp * d * x.dtype.itemsize + d * m * 2,
            transcendentals=tp * m,
        ),
    )(xp, w1_q, row(w1_scale), row(b1), w2_q, row(w2_scale), row(b2),
      row(ln_scale), row(ln_bias))
    return out[:T]
