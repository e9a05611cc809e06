"""Checkpoint-dir loading paths: HF save_pretrained dirs -> our encoders.

Exercises models/checkpoint.py (safetensors + config.json resolution)
and each encoder's model_path constructor against tiny random-weight
checkpoints written to disk — the exact flow a user with real weights
hits.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from emr2a_tpu.models.checkpoint import load_state_dict, restore_params, save_params


@pytest.fixture(scope="module")
def clip_dir(tmp_path_factory):
    from transformers import CLIPConfig as HFCLIPConfig, CLIPModel
    cfg = HFCLIPConfig(
        text_config=dict(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         max_position_embeddings=16, vocab_size=100,
                         eos_token_id=99, pad_token_id=99, bos_token_id=98),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=32, patch_size=16),
        projection_dim=16)
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    d = tmp_path_factory.mktemp("clip_ckpt")
    model.save_pretrained(d)
    return d, model


def test_load_state_dict_safetensors(clip_dir):
    d, model = clip_dir
    sd = load_state_dict(d)
    assert "visual_projection.weight" in sd
    np.testing.assert_array_equal(
        sd["visual_projection.weight"],
        model.state_dict()["visual_projection.weight"].numpy())


def test_clip_encoder_from_dir(clip_dir, rng):
    from emr2a_tpu.encoders import CLIPEncoder
    d, model = clip_dir
    enc = CLIPEncoder(model_path=str(d), max_batch=4)
    img = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
    out = enc.encode_batch_images([img])
    assert out[0].shape == (16,)
    assert abs(np.linalg.norm(out[0]) - 1.0) < 1e-4


def test_qwen_encoder_from_dir(tmp_path, rng):
    from tests.test_qwen3_vl_parity import tiny_hf_model
    from emr2a_tpu.encoders.qwen3_vl_encoder import (
        Qwen3VLEncoder, make_image_processor)
    model, cfg = tiny_hf_model()
    d = tmp_path / "qwen_ckpt"
    model.save_pretrained(d)
    enc = Qwen3VLEncoder(model_path=str(d))
    enc.image_processor = make_image_processor(enc.config.vision,
                                               min_pixels=16, max_pixels=16384)
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    out = enc.encode_batch_images([img])
    assert out[0].shape == (32,)


def test_orbax_param_cache_roundtrip(tmp_path, rng):
    params = {"layer": {"kernel": rng.randn(4, 8).astype(np.float32),
                        "bias": rng.randn(8).astype(np.float32)}}
    save_params(params, tmp_path / "cache")
    restored = restore_params(tmp_path / "cache")
    np.testing.assert_array_equal(restored["layer"]["kernel"],
                                  params["layer"]["kernel"])


def test_load_or_convert_caches(clip_dir, rng):
    from emr2a_tpu.models.checkpoint import load_or_convert
    from emr2a_tpu.models.convert import convert_hf_clip_image_tower
    d, model = clip_dir
    calls = []

    def convert(sd):
        calls.append(1)
        return convert_hf_clip_image_tower(sd, num_layers=2)

    p1 = load_or_convert(d, convert)
    p2 = load_or_convert(d, convert)  # served from the orbax cache
    assert len(calls) == 1
    np.testing.assert_array_equal(
        np.asarray(p1["visual_projection"]["kernel"]),
        np.asarray(p2["visual_projection"]["kernel"]))


def test_load_or_convert_stale_cache_reconverts(clip_dir):
    import os, time
    from emr2a_tpu.models.checkpoint import load_or_convert
    from emr2a_tpu.models.convert import convert_hf_clip_image_tower
    d, model = clip_dir
    calls = []

    def convert(sd):
        calls.append(1)
        return convert_hf_clip_image_tower(sd, num_layers=2)

    load_or_convert(d, convert, cache_name="stale_test")
    # touch the weights newer than the cache -> must reconvert
    wt = next(iter(d.glob("*.safetensors")))
    future = time.time() + 10
    os.utime(wt, (future, future))
    load_or_convert(d, convert, cache_name="stale_test")
    assert len(calls) == 2


def test_qwen3_vl_bringup_cli(tmp_path):
    """The --qwen3-vl bring-up smoke end-to-end on a SHARDED tiny
    checkpoint dir (forced multi-file safetensors exercises the shard
    loader the real 8B checkpoint needs)."""
    from tests.test_qwen3_vl_parity import tiny_hf_model
    from tests.test_qwen_encoder_backend import ToyTokenizer
    from emr2a_tpu.models.convert import bringup_qwen3_vl

    model, cfg = tiny_hf_model()
    d = tmp_path / "qwen_sharded"
    model.save_pretrained(d, max_shard_size="50KB")
    shards = list(d.glob("*.safetensors"))
    assert len(shards) > 1, "expected a sharded checkpoint"
    # preprocessor config matching the tiny tower's patch geometry
    # (the backend treats the checkpoint's preprocessor_config.json as
    # authoritative)
    (d / "preprocessor_config.json").write_text(json.dumps({
        "image_processor_type": "Qwen2VLImageProcessor",
        "patch_size": 4, "temporal_patch_size": 2, "merge_size": 2,
        "min_pixels": 16, "max_pixels": 16384}))

    summary = bringup_qwen3_vl(d, max_new_tokens=4,
                               tokenizer=ToyTokenizer(), image_size=16)
    assert summary["image_tap_dim"] == 32
    assert summary["text_dim"] == 48
    # the toy tokenizer is honestly non-reversible: the round-trip
    # field must say so (strict check), without failing the smoke for
    # an injected tokenizer
    assert summary["tokenizer_roundtrip_ok"] is False
    assert isinstance(summary["generated"], str)


@pytest.mark.skipif(
    "EMR2A_QWEN3_VL_DIR" not in __import__("os").environ,
    reason="set EMR2A_QWEN3_VL_DIR to a real HF Qwen3-VL checkpoint")
def test_qwen3_vl_bringup_real_checkpoint():
    import os

    from emr2a_tpu.models.convert import bringup_qwen3_vl
    summary = bringup_qwen3_vl(os.environ["EMR2A_QWEN3_VL_DIR"])
    assert summary["tokenizer_roundtrip_ok"]
