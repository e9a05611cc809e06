"""Qwen3-VL flax vs random-init HF torch model: vision tower, full
multimodal forward, and greedy generation."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from emr2a_tpu.models.qwen3_vl import (
    Qwen3VLConfig,
    Qwen3VLGenerator,
    Qwen3VLModel,
    QwenTextConfig,
    QwenVisionConfig,
    QwenVisionTower,
    compute_mrope_position_ids,
    convert_hf_qwen3_vl,
    qwen3_vl_config_from_hf,
)

ATOL = 5e-4


def tiny_hf_model():
    from transformers import Qwen3VLConfig as HFConfig
    from transformers import Qwen3VLForConditionalGeneration
    cfg = HFConfig(
        vision_config=dict(
            depth=3, hidden_size=32, intermediate_size=64, num_heads=2,
            patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
            out_hidden_size=48, num_position_embeddings=64,
            deepstack_visual_indexes=[0, 1], in_channels=3),
        text_config=dict(
            vocab_size=200, hidden_size=48, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=12,
            intermediate_size=96, rope_theta=10000.0,
            rope_scaling={"rope_type": "default", "mrope_section": [2, 2, 2]},
            max_position_embeddings=512),
        image_token_id=190, video_token_id=191, vision_start_token_id=192,
        tie_word_embeddings=True,
        attn_implementation="eager")
    torch.manual_seed(0)
    model = Qwen3VLForConditionalGeneration(cfg).eval()
    return model, cfg


@pytest.fixture(scope="module")
def hf():
    return tiny_hf_model()


def my_config(cfg) -> Qwen3VLConfig:
    return qwen3_vl_config_from_hf(cfg.to_dict())


def make_pixels(rng, h=16, w=16):
    """Qwen patch layout via the HF image processor."""
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor)
    proc = Qwen2VLImageProcessor(patch_size=4, temporal_patch_size=2,
                                 merge_size=2, min_pixels=16,
                                 max_pixels=16384)
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    out = proc(images=[img], return_tensors="np")
    return out["pixel_values"], out["image_grid_thw"]


def test_vision_tower_parity(hf, rng):
    model, cfg = hf
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_qwen3_vl(sd, vision_depth=3, text_layers=2)
    mycfg = my_config(cfg)

    pixels, grid = make_pixels(rng)
    with torch.no_grad():
        expected, expected_deep = model.model.visual(
            torch.tensor(pixels), grid_thw=torch.tensor(grid))
    tower = QwenVisionTower(mycfg.vision)
    got, got_deep, _ = tower.apply(
        {"params": params["visual"]}, jnp.asarray(pixels),
        tuple(tuple(int(x) for x in g) for g in grid))
    np.testing.assert_allclose(np.asarray(got), expected.numpy(),
                               atol=ATOL, rtol=1e-3)
    assert len(got_deep) == len(expected_deep) == 2
    for g, e in zip(got_deep, expected_deep):
        np.testing.assert_allclose(np.asarray(g), e.numpy(),
                                   atol=ATOL, rtol=1e-3)


def build_multimodal_ids(cfg, grid, prompt_tail):
    n_img_tokens = int(np.prod(grid[0]) // 4)  # merge_size² = 4
    ids = ([192] + [190] * n_img_tokens + list(prompt_tail))
    return np.array([ids], dtype=np.int64)


def test_full_forward_parity_with_image(hf, rng):
    model, cfg = hf
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_qwen3_vl(sd, vision_depth=3, text_layers=2)
    mycfg = my_config(cfg)

    pixels, grid = make_pixels(rng)
    input_ids = build_multimodal_ids(cfg, grid, [5, 6, 7, 8])
    with torch.no_grad():
        expected = model(
            input_ids=torch.tensor(input_ids),
            pixel_values=torch.tensor(pixels),
            image_grid_thw=torch.tensor(grid)).logits.numpy()

    mymodel = Qwen3VLModel(mycfg)
    pos = compute_mrope_position_ids(input_ids, [tuple(grid[0])],
                                     mycfg.image_token_id)
    logits, _ = mymodel.apply(
        {"params": params}, jnp.asarray(input_ids), jnp.asarray(pos),
        pixel_patches=jnp.asarray(pixels),
        grid_thw=tuple(tuple(int(x) for x in g) for g in grid))
    np.testing.assert_allclose(np.asarray(logits), expected,
                               atol=2e-3, rtol=1e-2)


def test_text_only_forward_parity(hf):
    model, cfg = hf
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_qwen3_vl(sd, vision_depth=3, text_layers=2)
    mycfg = my_config(cfg)
    input_ids = np.array([[3, 5, 8, 13, 21, 34]], dtype=np.int64)
    with torch.no_grad():
        expected = model(input_ids=torch.tensor(input_ids)).logits.numpy()
    mymodel = Qwen3VLModel(mycfg)
    pos = compute_mrope_position_ids(input_ids, [], mycfg.image_token_id)
    logits, _ = mymodel.apply({"params": params}, jnp.asarray(input_ids),
                              jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(logits), expected,
                               atol=1e-3, rtol=1e-2)


def test_greedy_generation_parity(hf, rng):
    model, cfg = hf
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_qwen3_vl(sd, vision_depth=3, text_layers=2)
    mycfg = my_config(cfg)

    pixels, grid = make_pixels(rng)
    input_ids = build_multimodal_ids(cfg, grid, [5, 6, 7])
    n_new = 6
    with torch.no_grad():
        out = model.generate(
            input_ids=torch.tensor(input_ids),
            pixel_values=torch.tensor(pixels),
            image_grid_thw=torch.tensor(grid),
            max_new_tokens=n_new, do_sample=False)
    expected = out[0, input_ids.shape[1]:].numpy()

    gen = Qwen3VLGenerator(Qwen3VLModel(mycfg), params,
                           eos_token_id=int(cfg.text_config.eos_token_id or 1))
    got = gen.generate(input_ids, pixel_patches=pixels,
                       grid_thw=tuple(tuple(int(x) for x in g) for g in grid),
                       max_new_tokens=n_new, temperature=0.0)[0]
    np.testing.assert_array_equal(got, expected)


def test_vision_tower_multi_image_parity(hf, rng):
    """Two images concatenated in one sequence: per-frame block-diagonal
    attention must match HF's cu_seqlens semantics."""
    model, cfg = hf
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_qwen3_vl(sd, vision_depth=3, text_layers=2)
    mycfg = my_config(cfg)

    p1, g1 = make_pixels(rng, 16, 16)
    p2, g2 = make_pixels(rng, 24, 16)
    pixels = np.concatenate([p1, p2], axis=0)
    grid = np.concatenate([g1, g2], axis=0)
    with torch.no_grad():
        expected, expected_deep = model.model.visual(
            torch.tensor(pixels), grid_thw=torch.tensor(grid))
    tower = QwenVisionTower(mycfg.vision)
    got, got_deep, _ = tower.apply(
        {"params": params["visual"]}, jnp.asarray(pixels),
        tuple(tuple(int(x) for x in g) for g in grid))
    np.testing.assert_allclose(np.asarray(got), expected.numpy(),
                               atol=ATOL, rtol=1e-3)
    for g, e in zip(got_deep, expected_deep):
        np.testing.assert_allclose(np.asarray(g), e.numpy(),
                                   atol=ATOL, rtol=1e-3)


def test_generation_bucketing_invariant(hf, rng):
    """Different prompt_bucket values must produce identical tokens
    (padding is fully masked)."""
    model, cfg = hf
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_qwen3_vl(sd, vision_depth=3, text_layers=2)
    mycfg = my_config(cfg)
    input_ids = np.array([[3, 5, 8, 13, 21, 34, 55, 89, 144, 6, 7]],
                         dtype=np.int64)
    gen = Qwen3VLGenerator(Qwen3VLModel(mycfg), params, eos_token_id=1)
    a = gen.generate(input_ids, max_new_tokens=5, prompt_bucket=16)
    b = gen.generate(input_ids, max_new_tokens=5, prompt_bucket=64)
    np.testing.assert_array_equal(a, b)
    with torch.no_grad():
        hf_out = model.generate(input_ids=torch.tensor(input_ids),
                                max_new_tokens=5, do_sample=False)
    np.testing.assert_array_equal(a[0], hf_out[0, input_ids.shape[1]:].numpy())


def test_chunked_decode_equals_one_shot(hf, rng):
    """chunk=K decode (host-side early exit) must be bit-identical to
    the one-shot scan: greedy, SAMPLED (the rng key threads through the
    carry, so per-step keys are the same), eos early-stop (the skipped
    tail must come back eos-padded), and a 2-row batch."""
    model, cfg = hf
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_qwen3_vl(sd, vision_depth=3, text_layers=2)
    mycfg = my_config(cfg)

    ids = np.array([[3, 5, 8, 13, 21, 34, 55, 89, 144, 6, 7],
                    [7, 2, 9, 31, 4, 16, 25, 36, 49, 64, 81]],
                   dtype=np.int64)
    gen = Qwen3VLGenerator(Qwen3VLModel(mycfg), params, eos_token_id=-1)
    for kwargs in (dict(temperature=0.0),
                   dict(temperature=0.8, top_p=0.9, seed=3)):
        a = gen.generate(ids, max_new_tokens=10, prompt_bucket=16, **kwargs)
        b = gen.generate(ids, max_new_tokens=10, prompt_bucket=16, chunk=3,
                         **kwargs)
        np.testing.assert_array_equal(a, b, err_msg=str(kwargs))

    # eos early-exit: stop on a token the model actually emits, so the
    # chunked loop breaks before max_new and pads the tail with eos
    stream = gen.generate(ids[:1], max_new_tokens=10, prompt_bucket=16)
    eos = int(stream[0, 2])
    gen_e = Qwen3VLGenerator(Qwen3VLModel(mycfg), params, eos_token_id=eos)
    a = gen_e.generate(ids[:1], max_new_tokens=10, prompt_bucket=16)
    b = gen_e.generate(ids[:1], max_new_tokens=10, prompt_bucket=16, chunk=3)
    np.testing.assert_array_equal(a, b)


def test_chunked_prefill_equals_one_shot(hf, rng):
    """prefill_chunk=C (sequence-chunked prompt pass, lax.scan over
    C-token slices) must reproduce the one-shot prefill exactly: each
    chunk's queries attend the same -inf-masked key set, so logits,
    the KV cache, and the greedy continuation are identical.  Covers a
    2-row mixed-content batch, the multimodal path (the image block
    spans chunk boundaries, exercising the sliced whole-prompt
    deepstack gather), and composition with the s8 KV cache."""
    model, cfg = hf
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_qwen3_vl(sd, vision_depth=3, text_layers=2)
    mycfg = my_config(cfg)
    gen = Qwen3VLGenerator(Qwen3VLModel(mycfg), params, eos_token_id=-1)
    gen_c = Qwen3VLGenerator(Qwen3VLModel(mycfg), params, eos_token_id=-1,
                             prefill_chunk=4)

    ids = np.array([[3, 5, 8, 13, 21, 34, 55, 89, 144, 6, 7],
                    [7, 2, 9, 31, 4, 16, 25, 36, 49, 64, 81]],
                   dtype=np.int64)
    a = gen.generate(ids, max_new_tokens=8, prompt_bucket=16)
    b = gen_c.generate(ids, max_new_tokens=8, prompt_bucket=16)
    np.testing.assert_array_equal(a, b)

    # multimodal: 64 image tokens span many 4-token chunks
    pixels, grid = make_pixels(rng)
    mm_ids = build_multimodal_ids(cfg, grid, [5, 6, 7])
    gtup = tuple(tuple(int(x) for x in g) for g in grid)
    a = gen.generate(mm_ids, pixel_patches=pixels, grid_thw=gtup,
                     max_new_tokens=6, prompt_bucket=8)
    b = gen_c.generate(mm_ids, pixel_patches=pixels, grid_thw=gtup,
                       max_new_tokens=6, prompt_bucket=8)
    np.testing.assert_array_equal(a, b)

    # s8 KV cache: per-chunk quantize-at-write must equal one-shot
    gen_q = Qwen3VLGenerator(Qwen3VLModel(mycfg), params, eos_token_id=-1,
                             kv_dtype="int8")
    gen_qc = Qwen3VLGenerator(Qwen3VLModel(mycfg), params, eos_token_id=-1,
                              kv_dtype="int8", prefill_chunk=8)
    a = gen_q.generate(ids, max_new_tokens=8, prompt_bucket=16)
    b = gen_qc.generate(ids, max_new_tokens=8, prompt_bucket=16)
    np.testing.assert_array_equal(a, b)


def test_auto_prefill_chunk(hf, monkeypatch):
    """prefill_chunk=None auto-chunks only when the one-shot prefill's
    per-layer (B, heads, S, L) f32 attention temps would blow the HBM
    budget (the measured B=32 / long-bucket OOMs — PERF_NOTES), so
    large batches and long prompt buckets serve without the flag; the
    auto-chunked stream must equal the one-shot tokens."""
    from emr2a_tpu.models import qwen3_vl as q
    from emr2a_tpu.models.serving import ContinuousBatcher

    # Arithmetic at the real 8B text geometry (heads=32):
    # B=8 @ bucket 1024 (0.8 GiB temps) serves one-shot (measured)
    assert q.auto_prefill_chunk(8, 32, 1024, 1536) is None
    # B=32 @ 1024 (6.4 GiB) measured OOM -> the measured chunk
    assert q.auto_prefill_chunk(32, 32, 1024, 1536) == 256
    # B=8 @ bucket 4096 (~17 GiB) long-context -> the measured chunk
    assert q.auto_prefill_chunk(8, 32, 4096, 4192) == 256
    # non-power-of-two bucket: the chunk must divide the bucket, and
    # the search continues past the first odd divisor (1000 = 8*125;
    # budget=1 forces the floor chunk of 1, with a warning)
    assert q.auto_prefill_chunk(1, 1, 1000, 1000, budget=1) == 1
    # ... and picks the largest *fitting* divisor, not 125-by-halving:
    # per_row = 1*1*1000*4 = 4000 B; budget 900 kB fits chunks <= 225
    # and the largest divisor of 1000 under that is 200
    assert q.auto_prefill_chunk(1, 1, 1000, 1000, budget=900_000) == 200

    model, cfg = hf
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_qwen3_vl(sd, vision_depth=3, text_layers=2)
    mycfg = my_config(cfg)
    ids = np.array([[3, 5, 8, 13, 21, 34, 55, 89, 144, 6, 7],
                    [7, 2, 9, 31, 4, 16, 25, 36, 49, 64, 81]],
                   dtype=np.int64)
    gen = Qwen3VLGenerator(Qwen3VLModel(mycfg), params, eos_token_id=-1)
    a = gen.generate(ids, max_new_tokens=8, prompt_bucket=16)

    # Shrink the budget so the tiny model triggers the auto path.
    monkeypatch.setattr(q, "_PREFILL_TEMP_BUDGET", 1)
    gen_auto = Qwen3VLGenerator(Qwen3VLModel(mycfg), params,
                                eos_token_id=-1)
    b = gen_auto.generate(ids, max_new_tokens=8, prompt_bucket=16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # The batcher resolves the same auto chunk per prefill program
    # (refill batch x suffix length); chunked==plain token parity is
    # pinned in tests/test_serving.py.
    batcher = ContinuousBatcher(Qwen3VLModel(mycfg), params, n_slots=2,
                                prompt_bucket=16, max_new_tokens=4)
    assert batcher._fit_chunk(16, 1) == 1


def test_int8_kv_cache_token_agreement(hf, rng):
    """kv_dtype="int8" (s8 KV cache + scales folded into the attention
    math) must reproduce the bf16-cache greedy tokens — single row,
    a 2-row batch, and the multimodal path."""
    model, cfg = hf
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_qwen3_vl(sd, vision_depth=3, text_layers=2)
    mycfg = my_config(cfg)
    gen_bf = Qwen3VLGenerator(Qwen3VLModel(mycfg), params, eos_token_id=-1)
    gen_q = Qwen3VLGenerator(Qwen3VLModel(mycfg), params, eos_token_id=-1,
                             kv_dtype="int8")

    ids = np.array([[3, 5, 8, 13, 21, 34, 55, 89, 144, 6, 7],
                    [7, 2, 9, 31, 4, 16, 25, 36, 49, 64, 81]],
                   dtype=np.int64)
    a = gen_bf.generate(ids, max_new_tokens=8, prompt_bucket=16)
    b = gen_q.generate(ids, max_new_tokens=8, prompt_bucket=16)
    np.testing.assert_array_equal(a, b)

    # multimodal single row (prefill writes image-position KV rows too)
    pixels, grid = make_pixels(rng)
    mm_ids = build_multimodal_ids(cfg, grid, [5, 6, 7])
    gtup = tuple(tuple(int(x) for x in g) for g in grid)
    a = gen_bf.generate(mm_ids, pixel_patches=pixels, grid_thw=gtup,
                        max_new_tokens=6)
    b = gen_q.generate(mm_ids, pixel_patches=pixels, grid_thw=gtup,
                       max_new_tokens=6)
    np.testing.assert_array_equal(a, b)


def test_vision_tower_uniform_multi_image_parity(hf, rng):
    """THREE same-resolution images in one sequence take the batched
    per-frame attention path (frames, seq_f, d) — the layout that keeps
    multi-image audit prompts from materializing (sum seq)^2 f32 logits
    — and must still match HF's flat cu_seqlens attention exactly, and
    a full multimodal generate must match HF end-to-end."""
    model, cfg = hf
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_qwen3_vl(sd, vision_depth=3, text_layers=2)
    mycfg = my_config(cfg)

    parts = [make_pixels(rng, 16, 16) for _ in range(3)]
    pixels = np.concatenate([p for p, _ in parts], axis=0)
    grid = np.concatenate([g for _, g in parts], axis=0)
    with torch.no_grad():
        expected, expected_deep = model.model.visual(
            torch.tensor(pixels), grid_thw=torch.tensor(grid))
    tower = QwenVisionTower(mycfg.vision)
    got, got_deep, _ = tower.apply(
        {"params": params["visual"]}, jnp.asarray(pixels),
        tuple(tuple(int(x) for x in g) for g in grid))
    np.testing.assert_allclose(np.asarray(got), expected.numpy(),
                               atol=ATOL, rtol=1e-3)
    for g, e in zip(got_deep, expected_deep):
        np.testing.assert_allclose(np.asarray(g), e.numpy(),
                                   atol=ATOL, rtol=1e-3)

    # end-to-end: uniform multi-image greedy generation matches HF
    # HF's get_rope_index locates image runs via vision_start (192)
    n_img_tok = int(grid.prod(axis=1).sum()) // 4
    image_ids = [192] + [190] * (n_img_tok // 3)
    ids = [[5, 6] + image_ids + image_ids + image_ids + [9]]
    ids_t = torch.tensor(ids)
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=ids_t, pixel_values=torch.tensor(pixels),
            image_grid_thw=torch.tensor(grid), max_new_tokens=6,
            do_sample=False)
    gen = Qwen3VLGenerator(Qwen3VLModel(mycfg), params, eos_token_id=-1)
    mine = gen.generate(np.asarray(ids, np.int64),
                        pixel_patches=np.asarray(pixels),
                        grid_thw=tuple(tuple(int(x) for x in g)
                                       for g in grid),
                        max_new_tokens=6, prompt_bucket=64)
    np.testing.assert_array_equal(np.asarray(mine)[0],
                                  hf_out[0, ids_t.shape[1]:].numpy())


def test_vision_tower_equal_area_mixed_aspect_parity(hf, rng):
    """Two frames with EQUAL AREA but different (h, w) grids — e.g.
    (1, 4, 8) + (1, 8, 4) — must NOT take the batched uniform-frame
    path: its rope broadcast applies the first frame's 2D coordinates
    to every frame, which is wrong the moment aspect ratios differ.
    They must fall back to the flat masked path and match HF exactly."""
    model, cfg = hf
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_qwen3_vl(sd, vision_depth=3, text_layers=2)
    mycfg = my_config(cfg)

    p1, g1 = make_pixels(rng, 16, 32)   # grid (1, 4, 8)
    p2, g2 = make_pixels(rng, 32, 16)   # grid (1, 8, 4)
    pixels = np.concatenate([p1, p2], axis=0)
    grid = np.concatenate([g1, g2], axis=0)
    assert tuple(grid[0][1:]) != tuple(grid[1][1:])
    assert int(grid[0][1] * grid[0][2]) == int(grid[1][1] * grid[1][2])
    with torch.no_grad():
        expected, _ = model.model.visual(torch.tensor(pixels),
                                         grid_thw=torch.tensor(grid))
    tower = QwenVisionTower(mycfg.vision)
    got, _, _ = tower.apply(
        {"params": params["visual"]}, jnp.asarray(pixels),
        tuple(tuple(int(x) for x in g) for g in grid))
    np.testing.assert_allclose(np.asarray(got), expected.numpy(),
                               atol=ATOL, rtol=1e-3)


def test_plan_vision_groups_requires_uniform_t(hf):
    """Group patch offsets assume constant patches-per-image, so a
    multi-frame video mixed with single-frame images at one resolution
    must refuse to group (mixed t would silently misalign every later
    group's pixel_patches slice)."""
    import emr2a_tpu.models.qwen3_vl as q

    _, cfg = hf
    mycfg = my_config(cfg)
    mixed_t = ((2, 4, 4), (1, 4, 4), (1, 4, 4))
    assert q.plan_vision_groups(mycfg.vision, mixed_t, budget=1) is None
    uniform = ((1, 4, 4),) * 3
    assert q.plan_vision_groups(mycfg.vision, uniform, budget=1) is not None


def test_vision_group_chunking_exact(hf, rng, monkeypatch):
    """Vision group-chunking (plan_vision_groups) splits a many-image
    forward at image boundaries; attention never crosses a frame, so a
    tiny forced budget must reproduce the one-shot logits bit-exactly,
    through embed splice, deepstack and generation."""
    import emr2a_tpu.models.qwen3_vl as q

    model, cfg = hf
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_qwen3_vl(sd, vision_depth=3, text_layers=2)
    mycfg = my_config(cfg)

    parts = [make_pixels(rng, 16, 16) for _ in range(4)]
    pixels = np.asarray(np.concatenate([p for p, _ in parts], axis=0))
    grid = tuple(tuple(int(x) for x in g[0]) for _, g in parts)
    n_img_tok = sum(t * h * w for t, h, w in grid) // 4
    per_img = n_img_tok // 4
    ids = [[5, 6] + ([192] + [190] * per_img) * 4 + [9]]
    ids = np.asarray(ids, np.int64)

    assert q.plan_vision_groups(mycfg.vision, grid) is None  # fits
    gen = Qwen3VLGenerator(Qwen3VLModel(mycfg), params, eos_token_id=-1)
    one_shot = np.asarray(gen.generate(
        ids, pixel_patches=pixels, grid_thw=grid, max_new_tokens=6,
        prompt_bucket=64))

    monkeypatch.setattr(q, "_VISION_TEMP_BUDGET", 1)  # force max splits
    groups = q.plan_vision_groups(mycfg.vision, grid)
    assert groups is not None and len(groups) == 4
    gen2 = Qwen3VLGenerator(Qwen3VLModel(mycfg), params, eos_token_id=-1)
    grouped = np.asarray(gen2.generate(
        ids, pixel_patches=pixels, grid_thw=grid, max_new_tokens=6,
        prompt_bucket=64))
    np.testing.assert_array_equal(grouped, one_shot)

    # mixed layouts never group (exactness would need per-image temp
    # accounting; standardize_images pins grids before batching)
    mixed = (grid[0], (1, 6, 4)) + grid[2:]
    assert q.plan_vision_groups(mycfg.vision, mixed) is None
