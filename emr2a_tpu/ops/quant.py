"""The row-wise symmetric s8 activation quantize.

One implementation shared by every int8/int4 compute path — the
XLA-side pass of linear_w8a8's large-T path, the in-kernel fused
quantize of the int8/int4 streaming linears, and the fused LN+MLP /
LN+attention kernels' intermediate re-quantizes.  Plain jnp, so it
traces identically inside Pallas kernels and in regular jit code;
keeping it single-sourced means the fused and split paths emit
identical s8 codes, and a change to the recipe (clip range, scale
floor) lands everywhere at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_rows_s8(x: jax.Array):
    """(rows, K) float -> ((rows, K) int8, (rows, 1) f32 scales).

    scale = max(|row|)/127 floored at 1e-12; codes = round(x / scale)
    clipped to [-127, 127], computed as a reciprocal multiply (cheaper
    on the VPU than a divide).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf * (1.0 / scale)), -127, 127).astype(jnp.int8)
    return q, scale
