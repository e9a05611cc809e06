"""Fused LN+QKV+attention+out-proj+residual kernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emr2a_tpu.ops.attention_block import fused_ln_attention


@pytest.mark.parametrize("B,S,d,H,hg,bb", [
    (3, 50, 64, 4, 2, 1),
    (4, 128, 32, 2, 2, 2),   # exact tile, batch-blocked
    (2, 197, 48, 4, 4, 1),   # ViT-ish ragged seq
])
def test_fused_ln_attention_matches_reference(rng, B, S, d, H, hg, bb):
    x = jnp.asarray(rng.randn(B, S, d) * 0.5, jnp.float32)
    mk = lambda *sh: jnp.asarray(rng.randn(*sh) * 0.05, jnp.float32)
    wq, wk, wv, wo = mk(d, d), mk(d, d), mk(d, d), mk(d, d)
    bq, bk, bv, bo = mk(d), mk(d), mk(d), mk(d)
    s = jnp.asarray(rng.rand(d) + 0.5, jnp.float32)
    b = mk(d)

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + 1e-6) * s + b
    q, k, v = h @ wq + bq, h @ wk + bk, h @ wv + bv
    hd = d // H
    qh = q.reshape(B, S, H, hd)
    kh = k.reshape(B, S, H, hd)
    vh = v.reshape(B, S, H, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * hd ** -0.5
    probs = jax.nn.softmax(logits, -1)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, S, d)
    expected = x + (attn @ wo + bo)

    got = fused_ln_attention(x, s, b, wq, bq, wk, bk, wv, bv, wo, bo,
                             num_heads=H, head_group=hg, block_b=bb,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5, rtol=1e-4)
