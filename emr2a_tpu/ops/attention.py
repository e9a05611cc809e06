"""Fused (flash-style) attention for short sequences — Pallas TPU.

The encoder towers run attention at seq ≈ 200-260 tokens where the
XLA path materializes the (B, H, S, S) probability tensor in HBM
(~0.5 GB per ViT-B layer at batch 256) and becomes bandwidth-bound —
measured ~10 ms/layer vs a ~0.2 ms compute roofline.  At these lengths
the whole per-(batch, head) problem fits VMEM, so the kernel simply
computes logits → masked softmax → output per grid cell with zero HBM
round trips: traffic drops to Q+K+V+O only.

Not a streaming flash kernel (no K/V tiling loop): the per-batch-item
scratch holds all H heads' (S, S) f32 logits (H*S*S*4 bytes — ~3 MB for
ViT-B at S=256), so VMEM bounds this kernel to encoder-scale sequences
(roughly S ≲ 350 at 12 heads); longer sequences need the K/V-tiled
flash formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-1e30)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, logits_scratch, *,
                 scale: float, valid_len: int, num_heads: int,
                 head_dim: int):
    # refs: (1, Sp, H*D); one batch item per program, heads handled
    # inside (per-(b,h) programs were dispatch-overhead-bound).
    # Three phases so the MXU matmuls batch up and the VPU softmax runs
    # once over all heads instead of 12 small dependent chains.
    sp = q_ref.shape[1]
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        logits_scratch[pl.ds(h * sp, sp), :] = jax.lax.dot_general(
            q_ref[0, :, sl], k_ref[0, :, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    logits = logits_scratch[:, :]                 # (H*Sp, Sp)
    if valid_len < sp:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < valid_len, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v_ref.dtype)

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        out = jax.lax.dot_general(
            probs[h * sp:(h + 1) * sp, :], v_ref[0, :, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float | None = None,
                    interpret: bool = False) -> jax.Array:
    """q/k/v: (B, S, H, D) -> (B, S, H, D).  No causal mask (encoder
    towers); S is padded to a sublane multiple internally."""
    B, S, H, D = q.shape
    if scale is None:
        scale = D ** -0.5
    sp = -(-S // 128) * 128  # pad S to a lane multiple for the (S,S) tile
    pad = [(0, 0), (0, sp - S), (0, 0), (0, 0)]
    # (B, Sp, H*D): the (q/k/v)_proj outputs are already in this layout,
    # so callers pay no transpose.
    qp = jnp.pad(q, pad).reshape(B, sp, H * D)
    kp = jnp.pad(k, pad).reshape(B, sp, H * D)
    vp = jnp.pad(v, pad).reshape(B, sp, H * D)

    spec = pl.BlockSpec((1, sp, H * D), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, valid_len=S,
                          num_heads=H, head_dim=D),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, sp, H * D), q.dtype),
        scratch_shapes=[pltpu.VMEM((H * sp, sp), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * sp * sp * D,
            bytes_accessed=4 * B * sp * H * D * q.dtype.itemsize,
            transcendentals=B * H * sp * sp,
        ),
    )(qp, kp, vp)
    return out.reshape(B, sp, H, D)[:, :S]
