"""W8A8 quantized tower path (models/quantize.py + int8 Pallas kernels)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emr2a_tpu.models.quantize import quantize_tower_params
from emr2a_tpu.models.vit import ViTConfig, VisionTransformer


@pytest.fixture(scope="module")
def tower():
    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64,
                    num_layers=3, num_heads=4, mlp_dim=128,
                    pooling="cls_ln", use_pre_layernorm=True,
                    fused_mlp=True, fused_attn=True)
    vt = VisionTransformer(cfg)
    params = vt.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 32, 32, 3)))["params"]
    return vt, params


def test_quantize_tower_params_structure(tower):
    vt, params = tower
    qp = quantize_tower_params(params)
    blk = qp["block_0"]
    assert blk["attn"]["q_proj"]["kernel_q"].dtype == np.int8
    assert "kernel" not in blk["attn"]["q_proj"]
    assert blk["mlp"]["fc1"]["kernel_q"].dtype == np.int8
    assert blk["mlp"]["fc1"]["kernel_scale"].shape == (128,)
    # non-block entries untouched
    assert "kernel" in qp["patch_embed"]


def test_quantized_tower_matches_float(tower, rng):
    """Full quantized forward vs float forward: embeddings must stay
    ranking-equivalent (row cosine)."""
    vt, params = tower
    x = jnp.asarray(rng.randn(4, 32, 32, 3) * 0.5, jnp.float32)
    ref = np.asarray(vt.apply({"params": params}, x), np.float64)
    qp = quantize_tower_params(params)
    got = np.asarray(vt.apply({"params": qp}, x), np.float64)
    cos = (ref * got).sum(1) / (np.linalg.norm(ref, axis=1)
                                * np.linalg.norm(got, axis=1))
    assert cos.min() > 0.999, cos
    assert np.isfinite(got).all()


def test_quantized_requires_fused(tower, rng):
    """Quantized params only route through the fused kernels; the
    einsum path would miss the kernel_q entries — the tower config must
    keep fused_attn/fused_mlp on (guarded here by behavior: a fused
    tower with quantized params runs; shapes out match)."""
    vt, params = tower
    qp = quantize_tower_params(params)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    out = vt.apply({"params": qp}, x)
    assert out.shape == (2, 64)


def test_quantized_qwen_decoder_matches(rng):
    """W8A8 decoder projections track the bf16 path (logit correlation
    and top-1 agreement on a tiny model)."""
    from emr2a_tpu.models.qwen3_vl import QwenTextConfig, QwenTextModel
    from emr2a_tpu.models.quantize import quantize_qwen_text_params

    cfg = QwenTextConfig(vocab_size=200, hidden_size=48, num_layers=2,
                         num_heads=4, num_kv_heads=2, head_dim=12,
                         intermediate_size=96, mrope_section=(2, 2, 2))
    m = QwenTextModel(cfg)
    pos = jnp.asarray(np.broadcast_to(np.arange(7)[None, None], (3, 2, 7)))
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 7, 48)),
                    pos)["params"]
    x = jnp.asarray(rng.randn(2, 7, 48) * 0.5, jnp.float32)
    ref, _ = m.apply({"params": params}, x, pos)
    got, _ = m.apply({"params": quantize_qwen_text_params(params)}, x, pos)
    a, b = np.asarray(ref, np.float64), np.asarray(got, np.float64)
    assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.9
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999


def test_quantized_params_on_einsum_path(tower, rng):
    """Quantized params meeting the non-fused (einsum) path must route
    through the streaming W8A8 linear kernel, not crash on a missing
    'kernel' (advisor round-2 finding): same params, fused kernels off,
    output still tracks the float tower."""
    vt, params = tower
    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64,
                    num_layers=3, num_heads=4, mlp_dim=128,
                    pooling="cls_ln", use_pre_layernorm=True,
                    fused_mlp=False, fused_attn=False)
    plain = VisionTransformer(cfg)
    x = jnp.asarray(rng.randn(2, 32, 32, 3) * 0.5, jnp.float32)
    ref = np.asarray(plain.apply({"params": params}, x), np.float64)
    got = np.asarray(plain.apply({"params": quantize_tower_params(params)},
                                 x), np.float64)
    cos = (ref * got).sum(1) / (np.linalg.norm(ref, axis=1)
                                * np.linalg.norm(got, axis=1))
    # weight-only quantization error (activations stay float here)
    assert cos.min() > 0.999, cos


def test_quantized_untied_lm_head(rng):
    """8B geometry uses an untied lm_head — quantize_qwen_text_params
    must W8 it and the model must route it through the streaming int8
    kernel with top-1 logit agreement."""
    from emr2a_tpu.models.qwen3_vl import QwenTextConfig, QwenTextModel
    from emr2a_tpu.models.quantize import quantize_qwen_text_params

    cfg = QwenTextConfig(vocab_size=200, hidden_size=48, num_layers=2,
                         num_heads=4, num_kv_heads=2, head_dim=12,
                         intermediate_size=96, mrope_section=(2, 2, 2),
                         tie_word_embeddings=False)
    m = QwenTextModel(cfg)
    pos = jnp.asarray(np.broadcast_to(np.arange(7)[None, None], (3, 2, 7)))
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 7, 48)),
                    pos)["params"]
    qp = quantize_qwen_text_params(params, lm_head_int8=True)
    assert qp["lm_head"]["kernel_q"].dtype == np.int8
    # default keeps lm_head bf16 (decode-optimal; see quantize.py)
    assert "kernel" in quantize_qwen_text_params(params)["lm_head"]
    x = jnp.asarray(rng.randn(2, 7, 48) * 0.5, jnp.float32)
    ref, _ = m.apply({"params": params}, x, pos)
    got, _ = m.apply({"params": qp}, x, pos)
    a, b = np.asarray(ref, np.float64), np.asarray(got, np.float64)
    assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.9
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999


def test_quantized_bert_with_padding_mask(rng):
    """W8A8 on a masked post-LN tower (PubMedBERT shape family): the
    einsum attention carries the padding mask while every projection
    runs the streaming int8 kernel; embeddings track the float tower."""
    from emr2a_tpu.models.quantize import quantize_params_tree
    from emr2a_tpu.models.text import BertConfig, BertEncoder

    cfg = BertConfig(vocab_size=120, max_length=16, hidden_size=64,
                     num_layers=2, num_heads=4, mlp_dim=128)
    enc = BertEncoder(cfg, pooling="cls")
    ids = np.asarray(rng.randint(2, 100, (3, 10)), np.int32)
    ids[:, 7:] = 0
    mask = (ids != 0).astype(np.int32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                      jnp.asarray(mask))["params"]
    ref = np.asarray(enc.apply({"params": params}, jnp.asarray(ids),
                               jnp.asarray(mask)), np.float64)
    got = np.asarray(enc.apply({"params": quantize_params_tree(params)},
                               jnp.asarray(ids), jnp.asarray(mask)),
                     np.float64)
    cos = (ref * got).sum(1) / (np.linalg.norm(ref, axis=1)
                                * np.linalg.norm(got, axis=1))
    assert cos.min() > 0.995, cos
    # the mask must still be respected: changing a padded token is a
    # no-op on the quantized path too
    ids2 = ids.copy()
    ids2[:, 8] = 55
    got2 = np.asarray(enc.apply({"params": quantize_params_tree(params)},
                                jnp.asarray(ids2), jnp.asarray(mask)),
                      np.float64)
    np.testing.assert_allclose(got, got2, rtol=1e-5, atol=1e-5)


def test_int8_backend_matches_bf16_tokens(rng):
    """QwenVLBackend(precision="int8") generates through the streaming
    W8A8 linear kernel end-to-end AND its greedy tokens agree with the
    bf16 backend (the toy tokenizer is crc32-deterministic, so the
    prompts are identical across backends and processes)."""
    pytest.importorskip("torch")
    from tests.test_qwen3_vl_parity import tiny_hf_model
    from tests.test_qwen_encoder_backend import ToyTokenizer
    from emr2a_tpu.models.qwen3_vl import (convert_hf_qwen3_vl,
                                           qwen3_vl_config_from_hf)
    from emr2a_tpu.judge.qwen_backend import QwenVLBackend
    from emr2a_tpu.encoders.qwen3_vl_encoder import make_image_processor

    model, cfg = tiny_hf_model()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    mycfg = qwen3_vl_config_from_hf(cfg.to_dict())
    params = convert_hf_qwen3_vl(sd, 3, 2)
    proc = make_image_processor(mycfg.vision, min_pixels=16,
                                max_pixels=16384)
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)

    outs = {}
    for precision in ("bf16", "int8"):
        be = QwenVLBackend(None, config=mycfg, params=params,
                           tokenizer=ToyTokenizer(), image_processor=proc,
                           precision=precision)
        outs[precision] = be.generate([img], "describe", max_new_tokens=8)
    assert isinstance(outs["int8"], str)
    # greedy decode: the tiny model's int8 logits keep 100% top-1
    # agreement with bf16 (see test_quantized_qwen_decoder_matches), so
    # the emitted token strings must match exactly
    assert outs["int8"] == outs["bf16"], outs


def test_int4_qwen_decoder_matches(rng):
    """W4A8 decoder projections (precision="int4") still track the
    bf16 path on a tiny model — looser than int8 (4-bit RTN cosine
    floor ~0.993/layer) but top-1 must remain dominant."""
    from emr2a_tpu.models.qwen3_vl import QwenTextConfig, QwenTextModel
    from emr2a_tpu.models.quantize import quantize_qwen_text_params

    cfg = QwenTextConfig(vocab_size=200, hidden_size=48, num_layers=2,
                         num_heads=4, num_kv_heads=2, head_dim=12,
                         intermediate_size=96, mrope_section=(2, 2, 2))
    m = QwenTextModel(cfg)
    pos = jnp.asarray(np.broadcast_to(np.arange(7)[None, None], (3, 2, 7)))
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 7, 48)),
                    pos)["params"]
    qp = quantize_qwen_text_params(params, precision="int4")
    assert qp["layer_0"]["q_proj"]["kernel_p4"].dtype == np.int8
    assert qp["layer_0"]["q_proj"]["kernel_p4"].shape[0] == 24  # K/2
    assert "kernel" not in qp["layer_0"]["q_proj"]
    x = jnp.asarray(rng.randn(2, 7, 48) * 0.5, jnp.float32)
    ref, _ = m.apply({"params": params}, x, pos)
    got, _ = m.apply({"params": qp}, x, pos)
    a, b = np.asarray(ref, np.float64), np.asarray(got, np.float64)
    assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.7
    # 4-bit RTN: ~0.993 cosine per projection compounds over 2 layers
    # + lm_head to ~0.975 logit correlation on this toy model — the
    # documented speed/accuracy tradeoff, not a kernel bug (kernel
    # exactness is pinned by tests/test_linear_int4.py)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.95


@pytest.mark.parametrize("precision", ["int8", "int4"])
def test_fused_projections_match_unfused(rng, precision):
    """fuse_projs=True merges q/k/v and gate/up into single streaming
    calls; per-column scales make the math identical, so logits must
    match the unfused quantized path to float tolerance."""
    from emr2a_tpu.models.qwen3_vl import QwenTextConfig, QwenTextModel
    from emr2a_tpu.models.quantize import quantize_qwen_text_params

    cfg = QwenTextConfig(vocab_size=200, hidden_size=48, num_layers=2,
                         num_heads=4, num_kv_heads=2, head_dim=12,
                         intermediate_size=96, mrope_section=(2, 2, 2))
    m = QwenTextModel(cfg)
    pos = jnp.asarray(np.broadcast_to(np.arange(7)[None, None], (3, 2, 7)))
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 7, 48)),
                    pos)["params"]
    qp = quantize_qwen_text_params(params, precision=precision)
    fp = quantize_qwen_text_params(params, precision=precision,
                                   fuse_projs=True)
    assert "qkv_proj" in fp["layer_0"] and "q_proj" not in fp["layer_0"]
    assert "gate_up_proj" in fp["layer_0"]
    x = jnp.asarray(rng.randn(2, 7, 48) * 0.5, jnp.float32)
    ref, _ = m.apply({"params": qp}, x, pos)
    got, _ = m.apply({"params": fp}, x, pos)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    # strict agreement where it matters: same greedy choices
    assert (np.asarray(ref).argmax(-1) == np.asarray(got).argmax(-1)).all()


def test_int4_backend_generates(rng):
    """QwenVLBackend(precision="int4") serves end-to-end through the
    W4A8 kernel: output must be deterministic across backend
    instances (greedy) and a nonempty token string.  bf16 token
    equality is NOT asserted — 4-bit weight noise legitimately moves
    toy-model logits (the numeric contract is pinned at model level
    above and at kernel level in test_linear_int4.py)."""
    pytest.importorskip("torch")
    from tests.test_qwen3_vl_parity import tiny_hf_model
    from tests.test_qwen_encoder_backend import ToyTokenizer
    from emr2a_tpu.models.qwen3_vl import (convert_hf_qwen3_vl,
                                           qwen3_vl_config_from_hf)
    from emr2a_tpu.judge.qwen_backend import QwenVLBackend
    from emr2a_tpu.encoders.qwen3_vl_encoder import make_image_processor

    model, cfg = tiny_hf_model()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    mycfg = qwen3_vl_config_from_hf(cfg.to_dict())
    params = convert_hf_qwen3_vl(sd, 3, 2)
    proc = make_image_processor(mycfg.vision, min_pixels=16,
                                max_pixels=16384)
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)

    class NoStopTokenizer(ToyTokenizer):
        # int4 logit noise makes the toy model's first greedy pick the
        # eos token (=1) — park eos outside the vocab so the test can
        # assert on real emitted content
        eos_token_id = 10_000

    outs = []
    for _ in range(2):
        be = QwenVLBackend(None, config=mycfg, params=params,
                           tokenizer=NoStopTokenizer(),
                           image_processor=proc, precision="int4")
        outs.append(be.generate([img], "describe", max_new_tokens=8))
    assert isinstance(outs[0], str) and len(outs[0].split()) == 8, outs
    assert outs[0] == outs[1], outs


def test_backend_rejects_unknown_precision():
    from emr2a_tpu.judge.qwen_backend import QwenVLBackend
    from emr2a_tpu.models.quantize import quantize_qwen_text_params
    with pytest.raises(ValueError):
        QwenVLBackend(None, config=object(), params={"language_model": {}},
                      tokenizer=object(), image_processor=object(),
                      precision="fp8")
    with pytest.raises(ValueError):
        quantize_qwen_text_params({}, precision="fp8")


def test_quantized_dp_inference(mesh8):
    """fast="int8" composes with data-parallel inference: the W8A8
    kernels run per-chip inside shard_map (step2 --data_parallel
    --fast int8)."""
    from emr2a_tpu.encoders.biomedclip_encoder import BioMedCLIPEncoder

    enc = BioMedCLIPEncoder.random_init(fast="int8", mesh=mesh8,
                                        max_batch=16)
    rng_ = np.random.RandomState(0)
    imgs = [(rng_.rand(224, 224, 3) * 255).astype(np.uint8)
            for _ in range(16)]
    out = enc.encode_batch_images(imgs)
    assert all(e is not None and np.isfinite(e).all() for e in out)
    norms = [np.linalg.norm(e) for e in out]
    # bf16 feature normalization: ~1e-3 deviation is precision, not dp
    assert all(abs(n - 1) < 2e-2 for n in norms)


def test_int4_audit_decisions_match_bf16(rng, tmp_path):
    """Decision-level gate for --precision int4 (the analog of
    test_int8_backend_matches_bf16_tokens one level up): the FULL audit
    pipeline — evidence packaging, prompt split, greedy generate
    through the W4A8 kernels, parser waterfall, decision thresholds —
    must produce the same audit decisions as the bf16 backend, across
    independent weight seeds.  Token streams may diverge (4-bit RTN is
    lossy; PERF_NOTES documents the tradeoff) — the gate pins that the
    thresholded decision layer absorbs that divergence on this
    fixture, and that the int4 path composes with the audit CLI
    surface.  Real-weight quality deltas still need real weights: the
    flag stays marked experimental in --help."""
    pytest.importorskip("torch")
    import jax
    from PIL import Image
    from tests.test_qwen3_vl_parity import tiny_hf_model
    from tests.test_qwen_encoder_backend import ToyTokenizer
    from emr2a_tpu.models.qwen3_vl import (Qwen3VLModel,
                                           qwen3_vl_config_from_hf)
    from emr2a_tpu.judge.qwen_backend import QwenVLBackend
    from emr2a_tpu.judge.audit import VLMAuditModule
    from emr2a_tpu.encoders.qwen3_vl_encoder import make_image_processor

    _, cfg = tiny_hf_model()
    mycfg = qwen3_vl_config_from_hf(cfg.to_dict())
    proc = make_image_processor(mycfg.vision, min_pixels=16,
                                max_pixels=16384)

    records = []
    for i in range(3):
        pdir = tmp_path / f"p{i}"
        pdir.mkdir()
        p = pdir / "0.png"
        Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(p)
        records.append({"patient_id": f"p{i}", "label": "PJP",
                        "slices": [str(p)], "meta": {"sex": "M", "age": 60}})
    kwargs = dict(
        retrieval_predictions=["PJP", "Viral", "Normal"],
        retrieval_similarities=[[0.9]] * 3,
        retrieval_labels=[["PJP"]] * 3,
        query_patients=records,
        top_neighbors_list=[[("p1", "PJP", 0.9)]] * 3,
        manifest=records, max_new_tokens=6)

    model = Qwen3VLModel(mycfg)
    n_img = 4 * 4 // (2 * 2)
    ids = jnp.concatenate([
        jnp.zeros((1, 2), jnp.int32),
        jnp.full((1, n_img), mycfg.image_token_id, jnp.int32),
        jnp.zeros((1, 2), jnp.int32)], axis=1)
    pos = jnp.zeros((3, 1, ids.shape[1]), jnp.int32)
    patches = jnp.zeros((16, 4 * 4 * 3 * 2), jnp.float32)

    for seed in (0, 1, 2):
        params = model.init(jax.random.PRNGKey(seed), ids, pos,
                            pixel_patches=patches,
                            grid_thw=((1, 4, 4),))["params"]
        decisions = {}
        for precision in ("bf16", "int4"):
            be = QwenVLBackend(None, config=mycfg, params=params,
                               tokenizer=ToyTokenizer(),
                               image_processor=proc, precision=precision,
                               prompt_bucket=64)
            out = VLMAuditModule(backend=be).audit_batch(
                output_dir=tmp_path / f"s{seed}_{precision}", **kwargs)
            decisions[precision] = [
                (r["final_decision"], r["vlm_decision"],
                 round(float(r["vlm_confidence"]), 6))
                for r in out["audit_results"]]
        assert decisions["int4"] == decisions["bf16"], (seed, decisions)
