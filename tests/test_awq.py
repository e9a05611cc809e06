"""AWQ-style activation-aware scale folding (models/awq.py).

Three layers of evidence, mirroring the round-4 int4 gate strategy:
1. the fold is output-preserving BEFORE quantization (exactness of the
   seven fold targets, including the GQA-constrained o-site),
2. the diagonal-objective search beats plain RTN on weights facing
   outlier activation channels (the regime AWQ exists for),
3. the full pipeline (calibrate -> search -> fold -> int4 quantize)
   runs on a tiny Qwen model and improves logits fidelity vs RTN int4
   under an outlier-heavy input distribution.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emr2a_tpu.models.awq import (
    _candidate_scale, _rtn_dequant, awq_quantize_qwen_text_params,
    collect_awq_stats, compute_awq_scales, fold_awq_scales)
from emr2a_tpu.models.qwen3_vl import Qwen3VLConfig, Qwen3VLModel
from emr2a_tpu.models.quantize import quantize_qwen_text_params


def tiny_model(dtype=jnp.float32):
    from emr2a_tpu.models.qwen3_vl import QwenTextConfig, QwenVisionConfig
    text = QwenTextConfig(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=96,
        mrope_section=(4, 2, 2), dtype=dtype)
    vis = QwenVisionConfig(
        depth=1, hidden_size=32, out_hidden_size=64, num_heads=2,
        patch_size=4, temporal_patch_size=1, spatial_merge_size=2,
        intermediate_size=48, num_position_embeddings=64,
        deepstack_visual_indexes=(0,), dtype=dtype)
    cfg = Qwen3VLConfig(text=text, vision=vis, image_token_id=250)
    model = Qwen3VLModel(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    pos = jnp.zeros((3, 1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, pos)["params"]
    return model, params, cfg


def _forward_logits(model, params, ids):
    B, S = ids.shape
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, None],
                           (3, B, S))
    logits, _ = model.apply({"params": params}, ids, pos)
    return np.asarray(logits, np.float64)


@pytest.fixture(scope="module")
def tiny():
    return tiny_model()


def test_collect_stats_shapes(tiny):
    model, params, cfg = tiny
    rng = np.random.RandomState(0)
    ids = rng.randint(2, 200, (2, 16))
    stats = collect_awq_stats(model, params, ids)
    assert set(stats) == {"layer_0", "layer_1"}
    t = cfg.text
    for layer in stats.values():
        amax, msq = layer["qkv"]
        assert amax.shape == (t.hidden_size,) and msq.shape == amax.shape
        assert (amax >= 0).all() and (msq > 0).all()
        assert layer["o"][0].shape == (t.num_heads * t.head_dim,)
        assert layer["gu"][0].shape == (t.hidden_size,)
        assert layer["down"][0].shape == (t.intermediate_size,)
    # multi-batch merge: max/mean combine, same shapes
    stats2 = collect_awq_stats(
        model, params, [ids, rng.randint(2, 200, (2, 16))])
    assert (stats2["layer_0"]["qkv"][0] >= stats["layer_0"]["qkv"][0] - 1e-6
            ).all()


def test_fold_is_output_preserving(tiny):
    """Folding arbitrary positive per-site scales (no quantization)
    must not change the f32 model's logits — validates all seven fold
    targets, the GQA group constraint on o, and the column folds on
    v/up."""
    model, params, cfg = tiny
    t = cfg.text
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(2, 200, (2, 12)))
    ref = _forward_logits(model, params, ids)

    groups_q = t.num_heads // t.num_kv_heads
    scales = {}
    for li in range(t.num_layers):
        r = np.random.RandomState(10 + li)
        s_o = np.repeat(                       # group-constant, kv-major
            np.exp(r.randn(t.num_kv_heads, 1, t.head_dim) * 0.5),
            groups_q, axis=1).reshape(-1).astype(np.float32)
        scales[f"layer_{li}"] = {
            "qkv": np.exp(r.randn(t.hidden_size) * 0.5).astype(np.float32),
            "o": s_o,
            "gu": np.exp(r.randn(t.hidden_size) * 0.5).astype(np.float32),
            "down": np.exp(r.randn(t.intermediate_size) * 0.5
                           ).astype(np.float32),
        }
    folded = fold_awq_scales(dict(params["language_model"]), scales,
                             t.num_kv_heads, t.head_dim)
    got = _forward_logits(model, {**params, "language_model": folded}, ids)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_search_beats_rtn_on_outlier_channels():
    """The core AWQ claim, isolated: with a few loud input channels,
    the searched fold reduces the activation-weighted reconstruction
    error AND the true output error of the quantized matmul."""
    rng = np.random.RandomState(0)
    K, N, group = 256, 128, 128
    w = (rng.randn(K, N) * 0.05).astype(np.float32)
    # activations: unit-scale channels with 8 loud outliers (x30)
    act_scale = np.ones(K, np.float32)
    act_scale[rng.choice(K, 8, replace=False)] = 30.0
    x = (rng.randn(512, K) * act_scale).astype(np.float32)
    amax = np.abs(x).max(0)
    msq = (x * x).mean(0)

    s = None
    best_err = None
    from emr2a_tpu.models.awq import _awq_site_err
    for alpha in (0.0, 0.25, 0.5, 0.75, 1.0):
        cand = _candidate_scale(amax, alpha)
        err = float(_awq_site_err(jnp.asarray(w), jnp.asarray(cand),
                                  jnp.asarray(msq), group))
        if best_err is None or err < best_err:
            best_err, s, best_alpha = err, cand, alpha
    err_rtn = float(_awq_site_err(jnp.asarray(w), jnp.ones(K, jnp.float32),
                                  jnp.asarray(msq), group))
    assert best_alpha > 0 and best_err < 0.9 * err_rtn

    ref = x @ w
    deq_rtn = np.asarray(_rtn_dequant(jnp.asarray(w), group))
    deq_awq = np.asarray(
        _rtn_dequant(jnp.asarray(w * s[:, None]), group)) / s[:, None]
    e_rtn = np.linalg.norm(x @ deq_rtn - ref)
    e_awq = np.linalg.norm(x @ deq_awq - ref)
    assert e_awq < e_rtn, (e_awq, e_rtn)


def _outlier_embed(params, cfg, factor=12.0, n_loud=6, seed=3):
    """Scale a few embedding channels up so decoder-layer inputs carry
    the outlier structure real LLMs show (massive activations)."""
    lm = dict(params["language_model"])
    emb = dict(lm["embed_tokens"])
    e = np.array(emb["embedding"], np.float32)
    loud = np.random.RandomState(seed).choice(e.shape[1], n_loud,
                                              replace=False)
    e[:, loud] *= factor
    emb["embedding"] = jnp.asarray(e, dtype=np.asarray(
        lm["embed_tokens"]["embedding"]).dtype)
    lm["embed_tokens"] = emb
    return {**params, "language_model": lm}


def test_awq_pipeline_improves_int4_logits(tiny):
    model, params, _ = tiny
    params = _outlier_embed(params, None)
    rng = np.random.RandomState(2)
    calib = rng.randint(2, 200, (4, 32))
    evalids = jnp.asarray(rng.randint(2, 200, (2, 24)))
    ref = _forward_logits(model, params, evalids)

    rtn = {**params, "language_model": quantize_qwen_text_params(
        dict(params["language_model"]), precision="int4")}
    awq, report = awq_quantize_qwen_text_params(
        model, params, calib, return_report=True)
    for layer in report.values():
        for site in ("qkv", "o", "gu", "down"):
            assert layer["err"][site]["awq"] <= layer["err"][site]["rtn"] + 1e-9

    def cos(a, b):
        a, b = a.reshape(-1, a.shape[-1]), b.reshape(-1, b.shape[-1])
        return float(np.mean((a * b).sum(-1) /
                             (np.linalg.norm(a, axis=-1)
                              * np.linalg.norm(b, axis=-1) + 1e-12)))

    c_rtn = cos(_forward_logits(model, rtn, evalids), ref)
    c_awq = cos(_forward_logits(model, awq, evalids), ref)
    assert c_awq >= c_rtn - 1e-4, (c_awq, c_rtn)
    assert c_awq > 0.97, c_awq
    # the quantized tree serves through the same kernel entries
    l0 = awq["language_model"]["layer_0"]
    assert "kernel_p4" in l0["q_proj"] and "kernel" not in l0["q_proj"]
