"""W4A8 streaming linear (ops/linear_int4) — interpret-mode tests.

Mirrors tests/test_linear_int8.py; the extra surface here is the
nibble packing (pack/unpack round-trip must be exact) and the
group-wise scales.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from emr2a_tpu.ops.linear_int4 import (
    _pick_tiles_w4, linear_w4a8, quantize_weight_int4)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _ref_dequant(w_p, w_scale, group):
    """Unpack + dequantize in numpy (the ground truth the kernel must
    reproduce through its s8 path)."""
    Kh, N = w_p.shape
    h = group // 2
    b = w_p.astype(np.int16)
    high = (b >> 4).astype(np.int8)
    low_u = (b & 0xF).astype(np.int8)
    low = np.where(low_u >= 8, low_u - 16, low_u)
    n_groups = 2 * Kh // group
    out = np.empty((2 * Kh, N), np.float32)
    for g in range(n_groups):
        out[g * group:g * group + h] = low[g * h:(g + 1) * h] * w_scale[g]
        out[g * group + h:(g + 1) * group] = (
            high[g * h:(g + 1) * h] * w_scale[g])
    return out


def test_pack_unpack_roundtrip(rng):
    w = rng.randn(256, 128).astype(np.float32)
    w_p, w_s = quantize_weight_int4(w, group=128)
    assert w_p.shape == (128, 128) and w_p.dtype == np.int8
    assert w_s.shape == (2, 128)
    deq = _ref_dequant(w_p, w_s, 128)
    # RTN to 4 bits: |w - deq| <= scale/2 elementwise
    per_group_scale = np.repeat(w_s, 128, axis=0)
    assert np.all(np.abs(w - deq) <= per_group_scale / 2 + 1e-7)


def test_quantize_rejects_bad_group():
    with pytest.raises(ValueError):
        quantize_weight_int4(np.zeros((100, 8), np.float32), group=64)


@pytest.mark.parametrize("T,K,N,use_bias", [
    (4, 256, 128, True),
    (40, 256, 384, False),
    (1, 512, 256, True),     # decode matvec shape
])
def test_linear_w4a8_matches_reference(rng, T, K, N, use_bias):
    x = (rng.randn(T, K) * 0.3).astype(np.float32)
    w = (rng.randn(K, N) * 0.05).astype(np.float32)
    bias = (rng.randn(N) * 0.1).astype(np.float32) if use_bias else None
    w_p, w_s = quantize_weight_int4(w, group=128)

    got = np.asarray(linear_w4a8(
        jnp.asarray(x), jnp.asarray(w_p), jnp.asarray(w_s),
        None if bias is None else jnp.asarray(bias),
        out_dtype=jnp.float32, interpret=True))

    # reference: same row quantization, dequantized weights, f32 math
    xa = np.maximum(np.abs(x).max(axis=-1, keepdims=True), 1e-12) / 127.0
    xq = np.clip(np.round(x / xa), -127, 127).astype(np.int8)
    ref = (xq.astype(np.float32) * xa) @ _ref_dequant(w_p, w_s, 128)
    if bias is not None:
        ref = ref + bias
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # and the 4-bit path tracks the float product at the RTN floor:
    # for gaussian weights, group-128 scale ~ 0.4 sigma -> elementwise
    # error std ~ 0.115 sigma -> output cosine ~ 0.993 regardless of K
    exact = x @ w + (bias if bias is not None else 0.0)
    cos = np.sum(got * exact) / (
        np.linalg.norm(got) * np.linalg.norm(exact) + 1e-12)
    assert cos > 0.99, cos


def test_linear_w4a8_leading_axes(rng):
    x = (rng.randn(2, 3, 256) * 0.3).astype(np.float32)
    w = (rng.randn(256, 128) * 0.05).astype(np.float32)
    w_p, w_s = quantize_weight_int4(w)
    out = linear_w4a8(jnp.asarray(x), jnp.asarray(w_p), jnp.asarray(w_s),
                      out_dtype=jnp.float32, interpret=True)
    assert out.shape == (2, 3, 128)
    flat = linear_w4a8(jnp.asarray(x.reshape(6, 256)), jnp.asarray(w_p),
                       jnp.asarray(w_s), out_dtype=jnp.float32,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(out).reshape(6, 128),
                               np.asarray(flat), rtol=1e-6)


def test_linear_w4a8_multi_row_tile(rng):
    """Multi-row-tile grids exercise the uncached kernel; result must
    match the default (single-tile, scratch-cached) path."""
    import emr2a_tpu.ops.linear_int4 as li

    x = (rng.randn(70, 256) * 0.3).astype(np.float32)
    w = (rng.randn(256, 128) * 0.05).astype(np.float32)
    w_p, w_s = quantize_weight_int4(w)
    ref = np.asarray(linear_w4a8(jnp.asarray(x), jnp.asarray(w_p),
                                 jnp.asarray(w_s), out_dtype=jnp.float32,
                                 interpret=True))
    orig = li._pick_tiles_w4
    li._pick_tiles_w4 = lambda *a: (32, 128)   # 3 row tiles
    try:
        got = np.asarray(linear_w4a8(jnp.asarray(x), jnp.asarray(w_p),
                                     jnp.asarray(w_s),
                                     out_dtype=jnp.float32, interpret=True))
    finally:
        li._pick_tiles_w4 = orig
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_linear_w4a8_shape_validation(rng):
    w = (rng.randn(256, 128)).astype(np.float32)
    w_p, w_s = quantize_weight_int4(w)
    with pytest.raises(ValueError):
        linear_w4a8(jnp.zeros((4, 512)), jnp.asarray(w_p),
                    jnp.asarray(w_s), interpret=True)
    with pytest.raises(ValueError):
        # scales rows that don't evenly divide K
        linear_w4a8(jnp.zeros((4, 256)), jnp.asarray(w_p),
                    jnp.asarray(w_s[:1]).repeat(3, 0), interpret=True)


def test_pick_tiles_w4_respects_budget():
    from emr2a_tpu.ops.linear_int4 import _VMEM_BUDGET

    for tp, K, N in [(32, 4096, 4096), (32, 12288, 4096),
                     (32, 4096, 12288), (1024, 4096, 4096),
                     (32, 4096, 151936)]:          # 8B lm_head
        tile_t, tile_n, fused = _pick_tiles_w4(tp, K, N, 2048, 2, 2)
        assert tile_t >= 32 and tile_n >= 128
        if fused:
            used = (2 * (tile_t * K * 2 + K // 2 * tile_n
                         + tile_t * tile_n * 2)
                    + 5 * tile_t * K + 4 * tile_t * tile_n + 16 * tile_n)
        else:
            used = (2 * (tile_t * K + K // 2 * tile_n
                         + tile_t * tile_n * 2)
                    + 4 * tile_t * tile_n + 16 * tile_n + 8 * tile_t)
        assert used <= _VMEM_BUDGET, (tp, K, N, tile_t, tile_n, used)


def test_pick_tiles_w4_alignment_non_pow2():
    """Same alignment contract as linear_int8._pick_tiles: halving from
    non-power-of-two starts must stay 32/128-aligned."""
    from emr2a_tpu.ops.linear_int4 import _pick_tiles_w4

    for tp, K, N in [(1504, 4096, 12288), (1024, 4096, 1920),
                     (992, 8192, 12288)]:
        tile_t, tile_n, fused = _pick_tiles_w4(tp, K, N, 2048, 2, 2)
        assert tile_t % 32 == 0 and tile_t >= 32, (tp, K, N, tile_t)
        assert tile_n % 128 == 0 and tile_n >= 128, (tp, K, N, tile_n)
    # serving shape stays on the fused (in-kernel quantize) path
    assert _pick_tiles_w4(32, 4096, 4096, 2048, 2, 2)[2] is True
    # prefill shape takes the pre-quantized s8 path
    assert _pick_tiles_w4(1504, 4096, 12288, 2048, 2, 2)[2] is False
