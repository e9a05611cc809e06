"""Streaming W8A8 linear kernel (ops/linear_int8.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from emr2a_tpu.ops.linear_int8 import _pick_tiles, linear_w8a8
from emr2a_tpu.ops.mlp import quantize_weight_int8


def _np_reference(x, w_q, w_scale, bias):
    xf = x.astype(np.float64)
    a = np.maximum(np.abs(xf).max(-1, keepdims=True), 1e-12) / 127.0
    xq = np.clip(np.round(xf / a), -127, 127)
    y = (xq @ w_q.astype(np.float64)) * a * w_scale[None, :]
    if bias is not None:
        y = y + bias[None, :]
    return y


@pytest.mark.parametrize("T,K,N", [
    (1, 64, 96),        # decode row
    (40, 128, 512),     # sub-tile rows, exact tile_n
    (700, 256, 384),    # multiple row tiles + padding on both axes
])
@pytest.mark.parametrize("use_bias", [True, False])
def test_linear_w8a8_matches_reference(rng, T, K, N, use_bias):
    x = rng.randn(T, K).astype(np.float32)
    w = rng.randn(K, N).astype(np.float32) * 0.05
    w_q, w_scale = quantize_weight_int8(w)
    w_scale = np.asarray(w_scale).reshape(-1)
    bias = rng.randn(N).astype(np.float32) if use_bias else None

    got = np.asarray(linear_w8a8(
        jnp.asarray(x), jnp.asarray(w_q), jnp.asarray(w_scale),
        None if bias is None else jnp.asarray(bias),
        out_dtype=jnp.float32, interpret=True))
    ref = _np_reference(x, np.asarray(w_q), w_scale, bias)
    # activation quantization is the only error source vs the f64 ref
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999


def test_linear_w8a8_leading_axes(rng):
    """(B, S, K) input keeps its leading shape."""
    x = rng.randn(3, 5, 64).astype(np.float32)
    w = rng.randn(64, 32).astype(np.float32)
    w_q, w_scale = quantize_weight_int8(w)
    out = linear_w8a8(jnp.asarray(x), jnp.asarray(w_q),
                      jnp.asarray(np.asarray(w_scale).reshape(-1)),
                      out_dtype=jnp.float32, interpret=True)
    assert out.shape == (3, 5, 32)


def test_linear_w8a8_multi_row_tile(rng):
    """T larger than the row-tile cap exercises the split-quantize
    (s8-streaming) kernel — must match the fused single-tile path."""
    import emr2a_tpu.ops.linear_int8 as li

    x = (rng.randn(70, 128) * 0.3).astype(np.float32)
    w = (rng.randn(128, 128) * 0.05).astype(np.float32)
    from emr2a_tpu.ops.linear_int8 import quantize_rows
    q, scale = quantize_rows(jnp.asarray(x))
    wq = np.clip(np.round(w / (np.abs(w).max(0) / 127)), -127,
                 127).astype(np.int8)
    ws = (np.abs(w).max(0) / 127).astype(np.float32)

    orig = li._pick_tiles
    li._pick_tiles = lambda *a: (32, 128, False)  # 3 row tiles, split
    try:
        got = np.asarray(linear_w8a8(jnp.asarray(x), jnp.asarray(wq),
                                     jnp.asarray(ws),
                                     out_dtype=jnp.float32, interpret=True))
    finally:
        li._pick_tiles = orig
    ref = (np.asarray(q, np.float32) * np.asarray(scale)) @ (
        wq.astype(np.float32) * ws)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pick_tiles_respects_budget():
    """Every shape the serving paths hit stays under the VMEM budget
    in its chosen mode (fused charges the quantize temporaries + xq
    scratch; split streams 1-byte activations), including the
    8B-geometry prefill that OOM'd the untiled kernel."""
    from emr2a_tpu.ops.linear_int8 import _VMEM_BUDGET

    for tp, K, N in [(32, 6144, 4096), (32, 12288, 4096),
                     (1024, 12288, 4096), (1024, 4096, 12288),
                     (16384, 768, 768), (256, 3072, 768)]:
        tile_t, tile_n, fused = _pick_tiles(tp, K, N, 2048, 2, 2)
        assert tile_t >= 32 and tile_n >= 128
        assert tile_t <= max(tp, 32)
        if fused:
            assert tile_t == tp  # fused only with a single row tile
            used = (2 * (tile_t * K * 2 + K * tile_n
                         + tile_t * tile_n * 2)
                    + 6 * tile_t * K + 12 * tile_n)
        else:
            used = (2 * (tile_t * K + K * tile_n + tile_t * tile_n * 2)
                    + 12 * tile_n + 8 * tile_t)
        assert used <= _VMEM_BUDGET, (tp, K, N, tile_t, tile_n, used)
    # the encoder shape takes the split path with a full-N
    # single-column grid (both operands stream through HBM exactly
    # once — the measured winner, 0.221 ms)
    assert _pick_tiles(18464, 1024, 1024, 2048, 2, 2)[1:] == (1024, False)
    # decode keeps one row tile (weights stream exactly once) on the
    # fused path (quantize cached in-kernel, no separate XLA pass)
    assert _pick_tiles(32, 6144, 4096, 2048, 2, 2)[::2] == (32, True)


def test_pick_tiles_alignment_non_pow2():
    """Shrinking from non-power-of-two starts must keep row tiles
    32-aligned (int8 sublane) and column tiles 128-aligned (lane):
    plain halving of a 1504-row prompt tile emitted 188/940-style
    tiles Mosaic rejects."""
    from emr2a_tpu.ops.linear_int8 import _VMEM_BUDGET, _pick_tiles

    for tp, K, N in [(1504, 4096, 12288), (2048, 4096, 1920),
                     (992, 8192, 12288), (32, 4096, 151936)]:
        tile_t, tile_n, fused = _pick_tiles(tp, K, N, 2048, 2, 2)
        assert tile_t % 32 == 0 and tile_t >= 32, (tp, K, N, tile_t)
        assert tile_n % 128 == 0 and tile_n >= 128, (tp, K, N, tile_n)
        if not fused:
            vmem = (2 * (tile_t * K + K * tile_n + tile_t * tile_n * 2)
                    + 12 * tile_n + 8 * tile_t)
            assert vmem <= _VMEM_BUDGET
