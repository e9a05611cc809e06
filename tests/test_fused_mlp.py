"""Fused LN+MLP kernel (interpret mode) + flax wiring parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emr2a_tpu.models.vit import ViTConfig, VisionTransformer
from emr2a_tpu.ops.mlp import fused_ln_mlp


def test_fused_ln_mlp_matches_reference(rng):
    T, d, m = 300, 64, 256
    x = jnp.asarray(rng.randn(T, d) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.randn(d, m) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(m) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.randn(m, d) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(d) * 0.01, jnp.float32)
    s = jnp.asarray(rng.rand(d) + 0.5, jnp.float32)
    b = jnp.asarray(rng.randn(d) * 0.1, jnp.float32)

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + 1e-6) * s + b
    expected = x + (jax.nn.gelu(h @ w1 + b1, approximate=True) @ w2 + b2)

    got = fused_ln_mlp(x, s, b, w1, b1, w2, b2, tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5, rtol=1e-4)


def test_vit_fused_mlp_flag_matches_unfused(rng, monkeypatch):
    """Same params through fused and unfused blocks -> same features
    (tanh-gelu substitution tolerance)."""
    import emr2a_tpu.ops.mlp as mlp_mod
    # route the in-model kernel through interpret mode on CPU
    orig = mlp_mod.fused_ln_mlp

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)
    monkeypatch.setattr(mlp_mod, "fused_ln_mlp", interp)

    cfg_plain = ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                          num_layers=2, num_heads=2, mlp_dim=128,
                          pooling="mean")
    cfg_fused = ViTConfig(**{**cfg_plain.__dict__, "fused_mlp": True})
    tower_p = VisionTransformer(cfg_plain)
    tower_f = VisionTransformer(cfg_fused)
    params = tower_p.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 32, 32, 3)))["params"]
    x = jnp.asarray(rng.randn(3, 32, 32, 3) * 0.5, jnp.float32)
    a = np.asarray(tower_p.apply({"params": params}, x))
    b = np.asarray(tower_f.apply({"params": params}, x))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-2)
