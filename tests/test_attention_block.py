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


def _interpret_fused_attn(monkeypatch):
    import emr2a_tpu.ops.attention_block as ab
    orig = ab.fused_ln_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)
    monkeypatch.setattr(ab, "fused_ln_attention", interp)


def test_transformer_block_fused_attn_parity(rng, monkeypatch):
    """fused_attn=True block output matches the einsum path within
    bf16 tolerance, with identical params."""
    import jax
    import jax.numpy as jnp
    _interpret_fused_attn(monkeypatch)
    from emr2a_tpu.models.layers import TransformerBlock
    x = jnp.asarray(rng.randn(3, 17, 64), jnp.float32)
    ref_blk = TransformerBlock(num_heads=4, mlp_dim=128)
    params = ref_blk.init(jax.random.PRNGKey(0), x)["params"]
    ref = ref_blk.apply({"params": params}, x)
    fused_blk = TransformerBlock(num_heads=4, mlp_dim=128, fused_attn=True)
    out = fused_blk.apply({"params": params}, x)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)


def test_vit_fused_attn_parity(rng, monkeypatch):
    """Full ViT tower with fused_attn+fused_mlp matches the default
    tower on identical params."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    _interpret_fused_attn(monkeypatch)
    import emr2a_tpu.ops.mlp as mlp_mod
    orig_mlp = mlp_mod.fused_ln_mlp

    def interp_mlp(*args, **kw):
        kw["interpret"] = True
        return orig_mlp(*args, **kw)
    monkeypatch.setattr(mlp_mod, "fused_ln_mlp", interp_mlp)
    from emr2a_tpu.models.vit import ViTConfig, VisionTransformer
    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                    num_layers=2, num_heads=4, mlp_dim=128,
                    pooling="cls_ln", use_pre_layernorm=True,
                    patch_bias=False)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    ref_m = VisionTransformer(cfg)
    params = ref_m.init(jax.random.PRNGKey(0), x)["params"]
    ref = ref_m.apply({"params": params}, x)
    fused_m = VisionTransformer(dataclasses.replace(
        cfg, fused_attn=True, fused_mlp=True))
    out = fused_m.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)


def test_pick_fused_attn_params_budget():
    """Kernel parameters scale down with shape instead of blowing VMEM
    (round-1 advisor: block_b=4 at ViT-L/336 shapes is ~25 MB)."""
    from emr2a_tpu.ops.attention_block import (
        fused_attn_vmem_bytes, pick_fused_attn_params)
    # ViT-B/16 keeps the tuned round-1 configuration.
    assert pick_fused_attn_params(768, 197, 12) == (4, 6)
    # ViT-L/336 (d=1024, S=577): whatever is picked must fit the budget,
    # and must be smaller than the ViT-B config.
    picked = pick_fused_attn_params(1024, 577, 16)
    if picked is not None:
        bb, hg = picked
        assert fused_attn_vmem_bytes(1024, 577, 16, hg, bb) <= 14 * 2 ** 20
        assert (bb, hg) < (4, 6)
    # An absurd shape must fall back rather than compile a VMEM bomb.
    assert pick_fused_attn_params(8192, 4096, 64) is None


def test_fused_ln_attention_vitl_geometry(rng):
    """Kernel numerics at ViT-L/336 dims (d=1024, S=577, 16 heads) with
    the minimal VMEM configuration (advisor round 1)."""
    B, S, d, H = 1, 577, 1024, 16
    x = jnp.asarray(rng.randn(B, S, d) * 0.5, jnp.float32)
    mk = lambda *sh: jnp.asarray(rng.randn(*sh) * 0.02, jnp.float32)
    wq, wk, wv, wo = mk(d, d), mk(d, d), mk(d, d), mk(d, d)
    bq, bk, bv, bo = mk(d), mk(d), mk(d), mk(d)
    s = jnp.asarray(rng.rand(d) + 0.5, jnp.float32)
    b = mk(d)

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + 1e-6) * s + b
    hd = d // H
    qh = (h @ wq + bq).reshape(B, S, H, hd)
    kh = (h @ wk + bk).reshape(B, S, H, hd)
    vh = (h @ wv + bv).reshape(B, S, H, hd)
    probs = jax.nn.softmax(
        jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * hd ** -0.5, -1)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, S, d)
    expected = x + (attn @ wo + bo)

    got = fused_ln_attention(x, s, b, wq, bq, wk, bk, wv, bv, wo, bo,
                             num_heads=H, head_group=1, block_b=1,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("B,S,D,H", [
    (1, 5, 32, 2),      # tiny, heavy padding
    (3, 128, 64, 4),    # S exactly one lane tile
    (5, 130, 64, 8),    # S just past a tile; B not block_b-multiple
    (2, 197, 96, 6),    # ViT-ish sequence, head_dim 16
])
def test_fused_ln_attention_shape_sweep(rng, monkeypatch, B, S, D, H):
    """Kernel == einsum reference across padding regimes."""
    import jax
    import jax.numpy as jnp
    _interpret_fused_attn(monkeypatch)
    from emr2a_tpu.models.layers import TransformerBlock
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    ref_blk = TransformerBlock(num_heads=H, mlp_dim=2 * D)
    params = ref_blk.init(jax.random.PRNGKey(0), x)["params"]
    ref = ref_blk.apply({"params": params}, x)
    out = TransformerBlock(num_heads=H, mlp_dim=2 * D,
                           fused_attn=True).apply({"params": params}, x)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)


@pytest.mark.parametrize("block_b,valid_len", [(2, None), (4, 197)])
def test_merged_batch_variant_matches(rng, block_b, valid_len):
    """merge_batch=True (LN + all projections at block_b*sq rows) is
    numerically identical to the per-item kernel."""
    import jax.numpy as jnp
    from emr2a_tpu.ops.attention_block import fused_ln_attention

    B, S, d, H = 5, 197 if valid_len is None else 200, 96, 6
    x = jnp.asarray(rng.randn(B, S, d) * 0.5, jnp.float32)
    mk = lambda *sh: jnp.asarray(rng.randn(*sh) * 0.1, jnp.float32)
    wq, wk, wv, wo = mk(d, d), mk(d, d), mk(d, d), mk(d, d)
    bq, bk, bv, bo = mk(d), mk(d), mk(d), mk(d)
    s, b = mk(d) + 1, mk(d)
    kw = dict(num_heads=H, head_group=3, block_b=block_b,
              valid_len=valid_len, interpret=True)
    base = fused_ln_attention(x, s, b, wq, bq, wk, bk, wv, bv, wo, bo, **kw)
    merged = fused_ln_attention(x, s, b, wq, bq, wk, bk, wv, bv, wo, bo,
                                merge_batch=True, **kw)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(base),
                               atol=1e-6, rtol=1e-6)


def test_vit_l_gated_out_even_with_int8_weights():
    """ViT-L/336 (d=1024, S=577) exceeds the VMEM budget in bf16 AND in
    W8A8: the int8 kernel's stack temporaries (s32 accumulators +
    quantized-activation copies) pushed a real run 6 MiB over the
    16 MiB scoped limit on-chip, so the gate must reject both — these
    shapes take the einsum/streaming path (docs/PERF_NOTES.md,
    encoder-zoo section)."""
    from emr2a_tpu.ops.attention_block import pick_fused_attn_params
    assert pick_fused_attn_params(1024, 577, 16) is None
    assert pick_fused_attn_params(1024, 577, 16, weight_itemsize=1) is None
    # ViT-B stays unlocked in both precisions
    assert pick_fused_attn_params(768, 197, 12) is not None
    assert pick_fused_attn_params(768, 197, 12, weight_itemsize=1) is not None


def test_int8_attention_vit_l_dims(rng):
    """W8A8 kernel numerics at ViT-L dims (d=1024, S=577, 16 heads),
    interpret mode.  The picker gates this shape OUT on real hardware
    (see test above); fixed small tiles keep the numerics pinned so the
    kernel stays correct if a bigger-VMEM part unlocks it later."""
    import jax.numpy as jnp
    from emr2a_tpu.ops.attention_block import (fused_ln_attention,
                                               fused_ln_attention_int8)
    from emr2a_tpu.ops.mlp import quantize_weight_int8

    B, S, d, H = 1, 577, 1024, 16
    bb, hg = 1, 2
    x = jnp.asarray(rng.randn(B, S, d) * 0.5, jnp.float32)
    mk = lambda *sh: rng.randn(*sh).astype(np.float32) * 0.05
    ws = [mk(d, d) for _ in range(4)]
    bs = [mk(d) for _ in range(4)]
    s1, b1 = mk(d) + 1, mk(d)
    ref = fused_ln_attention(
        x, jnp.asarray(s1), jnp.asarray(b1),
        *(jnp.asarray(a) for pair in zip(ws, bs) for a in pair),
        num_heads=H, head_group=hg, block_b=bb, interpret=True)
    qs = [quantize_weight_int8(w) for w in ws]
    got = fused_ln_attention_int8(
        x, jnp.asarray(s1), jnp.asarray(b1),
        *(jnp.asarray(a) for (q, sc), b in zip(qs, bs)
          for a in (q, sc, b)),
        num_heads=H, head_group=hg, block_b=bb, interpret=True)
    a = np.asarray(ref, np.float64).reshape(-1, d)
    b = np.asarray(got, np.float64).reshape(-1, d)
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1)
                            * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.999
