"""Vision flash-attention dispatch, padding, and tower parity.

The Pallas TPU flash kernel itself has no interpret mode, so the CPU
lane validates everything around it: block-size selection, the
pad-to-128/SegmentIds plumbing in frame_flash_attention (against a
dense reference with identical segment semantics), the attn_impl
config dispatch, and end-to-end tower parity flash-vs-einsum with the
kernel stubbed.  On-chip numerics are gated by
scripts/exp_vision_attn.py (prints max|Δ| vs the einsum chain before
timing).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emr2a_tpu.ops import vision_flash
from emr2a_tpu.models.qwen3_vl import (QwenVisionConfig, QwenVisionTower,
                                       resolve_vision_attn_impl)


def _ref_flash(q, k, v, segq, segkv, sm_scale):
    # dense reference with the kernel's segment semantics:
    # (B, H, S, hd); attention only within equal segment ids
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * sm_scale
    if segq is not None:
        mask = segq[:, None, :, None] == segkv[:, None, None, :]
        logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def test_block_picks_largest_divisor():
    # q blocks: 8-sublane granule
    assert vision_flash._block(896, 8) == 448
    assert vision_flash._block(1024, 8) == 512
    assert vision_flash._block(128, 8) == 128
    # kv blocks: the library kernel demands multiples of 128
    assert vision_flash._block(896, 128) == 128
    assert vision_flash._block(1024, 128) == 512
    assert vision_flash._block(256, 128) == 256
    assert vision_flash._block(2048, 128) == 512


def test_frame_flash_pads_and_masks(monkeypatch):
    monkeypatch.setattr(vision_flash, "_flash", _ref_flash)
    f, s, h, hd = 3, 50, 4, 8  # s pads to 128
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (f, s, h, hd), jnp.float32)
    k = jax.random.normal(kk, (f, s, h, hd), jnp.float32)
    v = jax.random.normal(kv, (f, s, h, hd), jnp.float32)

    out = vision_flash.frame_flash_attention(q, k, v, hd ** -0.5)
    assert out.shape == (f, s, h, hd)

    # direct per-frame softmax attention, no padding anywhere
    logits = jnp.einsum("fqhd,fkhd->fhqk", q, k) * hd ** -0.5
    probs = jax.nn.softmax(logits, axis=-1)
    want = jnp.einsum("fhqk,fkhd->fqhd", probs, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_frame_flash_aligned_skips_segments(monkeypatch):
    calls = {}

    def spy(q, k, v, segq, segkv, sm_scale):
        calls["seg"] = segq
        return _ref_flash(q, k, v, segq, segkv, sm_scale)

    monkeypatch.setattr(vision_flash, "_flash", spy)
    f, s, h, hd = 2, 128, 2, 8
    q = jnp.ones((f, s, h, hd))
    vision_flash.frame_flash_attention(q, q, q, hd ** -0.5)
    assert calls["seg"] is None


def test_attn_impl_dispatch():
    cfg = QwenVisionConfig()
    # CPU lane: auto resolves to einsum (scan/flash are TPU lowerings)
    assert resolve_vision_attn_impl(cfg) == "einsum"
    assert resolve_vision_attn_impl(
        QwenVisionConfig(attn_impl="flash")) == "flash"
    assert resolve_vision_attn_impl(
        QwenVisionConfig(attn_impl="scan")) == "scan"
    assert resolve_vision_attn_impl(
        QwenVisionConfig(attn_impl="einsum")) == "einsum"


@pytest.mark.parametrize("impl", ["flash", "scan"])
@pytest.mark.parametrize("n_frames", [1, 3])
def test_tower_flash_matches_einsum(monkeypatch, n_frames, impl):
    """Full tower forward, attn_impl=flash (kernel stubbed) or =scan
    (the default TPU lowering, lax.map per frame) must equal
    attn_impl=einsum on the uniform frame-batched layout — pins the
    q/k/v layout handoff, rope application order, and output reshape.

    n_frames=1 keeps the flat (unbatched) path on BOTH configs — the
    alternate dispatch requires the 3D frame-batched layout."""
    monkeypatch.setattr(vision_flash, "_flash", _ref_flash)
    base = dict(depth=2, hidden_size=32, intermediate_size=64,
                num_heads=4, patch_size=4, temporal_patch_size=2,
                spatial_merge_size=2, out_hidden_size=16,
                num_position_embeddings=64,
                deepstack_visual_indexes=(0,))
    cfg_e = QwenVisionConfig(**base, attn_impl="einsum")
    cfg_f = QwenVisionConfig(**base, attn_impl=impl)
    g = 4
    grid = ((1, g, g),) * n_frames
    patches = jax.random.normal(
        jax.random.PRNGKey(1), (n_frames * g * g, cfg_e.patch_dim))
    tower_e = QwenVisionTower(cfg_e)
    params = tower_e.init(jax.random.PRNGKey(2), patches, grid)["params"]
    out_e, ds_e, taps_e = tower_e.apply({"params": params}, patches, grid,
                                        tap_layers=(1,))
    out_f, ds_f, taps_f = QwenVisionTower(cfg_f).apply(
        {"params": params}, patches, grid, tap_layers=(1,))
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(out_f),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(taps_e[0]), np.asarray(taps_f[0]),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ds_e[0]), np.asarray(ds_f[0]),
                               atol=2e-5, rtol=2e-5)
