"""Speculative decoding must emit EXACTLY the target's greedy stream.

The acceptance rule (longest draft prefix matching the target argmax,
plus the target's correction token) makes greedy speculative decoding
lossless — so the strongest test needs no real weights: generate with
SpeculativeGenerator and with the plain Qwen3VLGenerator and require
token-for-token equality, across draft quality (self-draft = 100%
acceptance, independent random draft ~= 0%), KV precisions, and eos
stopping.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from emr2a_tpu.models.qwen3_vl import (
    Qwen3VLConfig,
    Qwen3VLGenerator,
    Qwen3VLModel,
    QwenTextConfig,
    QwenVisionConfig,
)
from emr2a_tpu.models.speculative import SpeculativeGenerator


def tiny_config(hidden=64, layers=2):
    text = QwenTextConfig(
        vocab_size=128, hidden_size=hidden, num_layers=layers,
        num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=96,
        mrope_section=(4, 2, 2), dtype=jnp.float32)
    vis = QwenVisionConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
        patch_size=4, temporal_patch_size=1, spatial_merge_size=2,
        out_hidden_size=hidden, num_position_embeddings=64,
        deepstack_visual_indexes=(0,), dtype=jnp.float32)
    return Qwen3VLConfig(vision=vis, text=text, image_token_id=120)


def init_params(cfg, seed, with_vision=False):
    import jax
    model = Qwen3VLModel(cfg)
    if with_vision:
        # a 4x4 image grid so the vision tower params get created
        n_img = 4 * 4 // (2 * 2)
        ids = jnp.concatenate([
            jnp.zeros((1, 2), jnp.int32),
            jnp.full((1, n_img), cfg.image_token_id, jnp.int32),
            jnp.zeros((1, 2), jnp.int32)], axis=1)
        pos = jnp.zeros((3, 1, ids.shape[1]), jnp.int32)
        patches = jnp.zeros((16, 4 * 4 * 3 * 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(seed), ids, pos,
                               pixel_patches=patches, grid_thw=((1, 4, 4),))
    else:
        ids = jnp.zeros((1, 4), jnp.int32)
        pos = jnp.zeros((3, 1, 4), jnp.int32)
        variables = model.init(jax.random.PRNGKey(seed), ids, pos)
    return model, variables["params"]


PROMPT = np.array([[3, 5, 8, 13, 21, 34, 55, 89, 100, 6, 7]], np.int64)


@pytest.mark.parametrize("draft_seed,label",
                         [(0, "self-draft"), (7, "independent-draft")])
def test_speculative_equals_greedy(draft_seed, label):
    cfg = tiny_config()
    tmodel, tparams = init_params(cfg, 0)
    dmodel, dparams = init_params(cfg, draft_seed)

    gen = Qwen3VLGenerator(tmodel, tparams, eos_token_id=-1)
    expected = gen.generate(PROMPT, max_new_tokens=12, prompt_bucket=16)

    spec = SpeculativeGenerator(tmodel, tparams, dmodel, dparams,
                                spec_k=3, eos_token_id=-1)
    got = spec.generate(PROMPT, max_new_tokens=12, prompt_bucket=16)
    np.testing.assert_array_equal(got, expected, err_msg=label)


def test_speculative_int8_kv_equals_greedy():
    cfg = tiny_config()
    tmodel, tparams = init_params(cfg, 0)
    dmodel, dparams = init_params(cfg, 3)

    gen = Qwen3VLGenerator(tmodel, tparams, eos_token_id=-1,
                           kv_dtype="int8")
    expected = gen.generate(PROMPT, max_new_tokens=10, prompt_bucket=16)

    spec = SpeculativeGenerator(tmodel, tparams, dmodel, dparams,
                                spec_k=2, eos_token_id=-1, kv_dtype="int8")
    got = spec.generate(PROMPT, max_new_tokens=10, prompt_bucket=16)
    np.testing.assert_array_equal(got, expected)


def test_speculative_w8a8_equals_quantized_greedy():
    """Speculative decoding over W8A8-quantized target AND draft params
    (the 8B serving configuration, scripts/exp_spec_decode.py) must
    equal the quantized target's own greedy stream."""
    from emr2a_tpu.models.quantize import quantize_qwen_text_params
    cfg = tiny_config()
    tmodel, tparams = init_params(cfg, 0)
    dmodel, dparams = init_params(cfg, 7)
    tq = {**tparams, "language_model":
          quantize_qwen_text_params(tparams["language_model"])}
    dq = {**dparams, "language_model":
          quantize_qwen_text_params(dparams["language_model"])}

    gen = Qwen3VLGenerator(tmodel, tq, eos_token_id=-1)
    expected = gen.generate(PROMPT, max_new_tokens=10, prompt_bucket=16)
    spec = SpeculativeGenerator(tmodel, tq, dmodel, dq,
                                spec_k=3, eos_token_id=-1)
    got = spec.generate(PROMPT, max_new_tokens=10, prompt_bucket=16)
    np.testing.assert_array_equal(got, expected)


def test_speculative_eos_stop():
    """Pick the token the target actually emits first as the eos id:
    the stream must cut there and pad with eos, matching the plain
    generator's semantics."""
    cfg = tiny_config()
    tmodel, tparams = init_params(cfg, 0)
    dmodel, dparams = init_params(cfg, 5)

    probe = Qwen3VLGenerator(tmodel, tparams, eos_token_id=-1)
    stream = probe.generate(PROMPT, max_new_tokens=8, prompt_bucket=16)[0]
    eos = int(stream[2])  # third emitted token becomes the stop token

    gen = Qwen3VLGenerator(tmodel, tparams, eos_token_id=eos)
    expected = gen.generate(PROMPT, max_new_tokens=8, prompt_bucket=16)
    spec = SpeculativeGenerator(tmodel, tparams, dmodel, dparams,
                                spec_k=3, eos_token_id=eos)
    got = spec.generate(PROMPT, max_new_tokens=8, prompt_bucket=16)
    np.testing.assert_array_equal(got, expected)


def test_speculative_multimodal():
    cfg = tiny_config()
    tmodel, tparams = init_params(cfg, 0, with_vision=True)
    dmodel, dparams = init_params(cfg, 9, with_vision=True)

    rng = np.random.RandomState(0)
    grid = ((1, 4, 4),)
    n_img_tokens = 4 * 4 // (2 * 2)
    patch_dim = 4 * 4 * 3 * 1
    pixels = rng.randn(16, patch_dim).astype(np.float32)
    ids = np.array([[5, 6] + [120] * n_img_tokens + [9, 2]], np.int64)

    gen = Qwen3VLGenerator(tmodel, tparams, eos_token_id=-1)
    expected = gen.generate(ids, pixel_patches=pixels, grid_thw=grid,
                            max_new_tokens=8, prompt_bucket=16)
    spec = SpeculativeGenerator(tmodel, tparams, dmodel, dparams,
                                spec_k=2, eos_token_id=-1)
    got = spec.generate(ids, pixel_patches=pixels, grid_thw=grid,
                        max_new_tokens=8, prompt_bucket=16)
    np.testing.assert_array_equal(got, expected)


def test_speculative_backend_matches_plain(rng):
    """QwenVLBackend(draft_params=...) serves greedy single requests
    through the speculative path and its emitted text must equal the
    plain backend's (lossless acceptance), through the real prompt
    assembly + image processing + tokenizer decode stack."""
    pytest.importorskip("torch")
    import jax
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
    # independent random draft with the same architecture/vocab
    dmodel = Qwen3VLModel(mycfg)
    n_img = 4
    ids = jnp.concatenate([
        jnp.zeros((1, 2), jnp.int32),
        jnp.full((1, n_img), mycfg.image_token_id, jnp.int32),
        jnp.zeros((1, 2), jnp.int32)], axis=1)
    pos = jnp.zeros((3, 1, ids.shape[1]), jnp.int32)
    patches = jnp.zeros((16, 4 * 4 * 3 * 2), jnp.float32)
    dparams = dmodel.init(jax.random.PRNGKey(11), ids, pos,
                          pixel_patches=patches,
                          grid_thw=((1, 4, 4),))["params"]

    proc = make_image_processor(mycfg.vision, min_pixels=16,
                                max_pixels=16384)
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    plain = QwenVLBackend(None, config=mycfg, params=params,
                          tokenizer=ToyTokenizer(), image_processor=proc)
    spec = QwenVLBackend(None, config=mycfg, params=params,
                         tokenizer=ToyTokenizer(), image_processor=proc,
                         draft_config=mycfg, draft_params=dparams,
                         spec_k=2)
    assert spec.spec_generator is not None
    a = plain.generate([img], "describe", max_new_tokens=8)
    b = spec.generate([img], "describe", max_new_tokens=8)
    assert a == b, (a, b)


def test_speculative_rejects_batch():
    cfg = tiny_config()
    tmodel, tparams = init_params(cfg, 0)
    spec = SpeculativeGenerator(tmodel, tparams, tmodel, tparams)
    with pytest.raises(ValueError, match="B=1"):
        spec.generate(np.zeros((2, 4), np.int64), max_new_tokens=4)
