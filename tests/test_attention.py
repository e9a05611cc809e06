"""Fused short-sequence attention kernel vs einsum reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from emr2a_tpu.ops.attention import fused_attention


def einsum_ref(q, k, v):
    d = q.shape[-1]
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * d ** -0.5
    logits = logits - logits.max(axis=-1, keepdims=True)
    probs = np.exp(logits)
    probs = probs / probs.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", probs, v)


@pytest.mark.parametrize("B,S,H,D", [
    (2, 197, 4, 64),   # ViT-B shape (padded internally to 256)
    (1, 128, 2, 32),   # exact tile
    (3, 50, 1, 16),    # small odd seq
])
def test_fused_attention_matches_reference(rng, B, S, H, D):
    q = rng.randn(B, S, H, D).astype(np.float32)
    k = rng.randn(B, S, H, D).astype(np.float32)
    v = rng.randn(B, S, H, D).astype(np.float32)
    got = np.asarray(fused_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), interpret=True))
    expected = einsum_ref(q, k, v)
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)


def test_padding_does_not_leak(rng):
    """Padded key positions must not receive attention mass: result for
    S=100 equals result computed with explicit S=100 numpy softmax."""
    B, S, H, D = 1, 100, 2, 32
    q = rng.randn(B, S, H, D).astype(np.float32)
    k = rng.randn(B, S, H, D).astype(np.float32) + 5.0  # big keys
    v = rng.randn(B, S, H, D).astype(np.float32)
    got = np.asarray(fused_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), interpret=True))
    np.testing.assert_allclose(got, einsum_ref(q, k, v), atol=2e-5, rtol=1e-4)
