"""Qwen3-VL encoder taps + generation backend with tiny random weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_qwen3_vl_parity import my_config, tiny_hf_model
from emr2a_tpu.encoders.qwen3_vl_encoder import Qwen3VLEncoder, make_image_processor
from emr2a_tpu.judge.qwen_backend import QwenVLBackend
from emr2a_tpu.models.qwen3_vl import convert_hf_qwen3_vl


class ToyTokenizer:
    """Minimal tokenizer: crc32 words to ids (deterministic across
    processes, unlike ``hash``), image placeholder = 190."""

    eos_token_id = 1

    SPECIALS = {"<IMG>": 190, "<VS>": 192, "<VE>": 193}

    def __call__(self, text, add_special_tokens=False, return_tensors=None):
        import zlib
        text = (text.replace("<|image_pad|>", " <IMG> ")
                .replace("<|vision_start|>", " <VS> ")
                .replace("<|vision_end|>", " <VE> "))
        ids = [self.SPECIALS.get(tok, zlib.crc32(tok.encode()) % 150 + 2)
               for tok in text.split()]
        if return_tensors == "np":
            return {"input_ids": np.asarray([ids], dtype=np.int64)}
        return {"input_ids": ids}

    def decode(self, tokens, skip_special_tokens=True):
        return " ".join(f"t{t}" for t in tokens)


@pytest.fixture(scope="module")
def tiny():
    model, cfg = tiny_hf_model()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_qwen3_vl(sd, vision_depth=3, text_layers=2)
    return model, cfg, params


def test_encoder_image_taps_match_reference_semantics(tiny, rng):
    """Tap embedding must equal mean-pool of the HF vision blocks'
    outputs at the target layers, averaged (the hook semantics)."""
    model, cfg, params = tiny
    mycfg = my_config(cfg)
    enc = Qwen3VLEncoder(config=mycfg, params=params,
                         tokenizer=ToyTokenizer(), target_layers=[-2, -1],
                         image_processor=make_image_processor(
                             mycfg.vision, min_pixels=16, max_pixels=16384))
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    out = enc.encode_batch_images([img, None])
    assert out[1] is None
    emb = out[0]
    assert emb.shape == (32,)  # vision hidden size

    # golden: run HF vision tower capturing block outputs via hooks
    proc = enc.image_processor(images=[img], return_tensors="np")
    captured = []
    hooks = [model.model.visual.blocks[i].register_forward_hook(
        lambda m, i_, o, store=captured: store.append(o.detach()))
        for i in (1, 2)]
    with torch.no_grad():
        model.model.visual(torch.tensor(proc["pixel_values"]),
                           grid_thw=torch.tensor(proc["image_grid_thw"]))
    for h in hooks:
        h.remove()
    golden = np.mean([c.numpy().mean(axis=0) for c in captured], axis=0)
    np.testing.assert_allclose(emb, golden, atol=5e-4, rtol=1e-3)


def test_encoder_text_path(tiny):
    model, cfg, params = tiny
    mycfg = my_config(cfg)
    enc = Qwen3VLEncoder(config=mycfg, params=params, tokenizer=ToyTokenizer())
    out = enc.encode_batch_texts(["性别: 男 年龄: 42", "другой текст"])
    assert out[0].shape == (48,)  # text hidden size
    assert not np.allclose(out[0], out[1])

    # golden: HF text model mean of final hidden state
    ids = ToyTokenizer()("性别: 男 年龄: 42", return_tensors="np")["input_ids"]
    with torch.no_grad():
        hidden = model.model.language_model(
            input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(out[0], hidden.mean(axis=1)[0],
                               atol=5e-4, rtol=1e-3)


def test_qwen_backend_generates_hf_parity(tiny, rng):
    """Backend end-to-end (chat render → patch → generate → decode)
    must reproduce HF greedy tokens.  Both sides run with eos disabled
    so the random-init model always emits the full 5 tokens (otherwise
    an eos-first draw would make the comparison vacuous)."""
    model, cfg, params = tiny
    mycfg = my_config(cfg)

    class NoEosTokenizer(ToyTokenizer):
        eos_token_id = -1  # never generated

    tok = NoEosTokenizer()
    backend = QwenVLBackend(
        model_path=None, config=mycfg, params=params, tokenizer=tok,
        image_processor=make_image_processor(mycfg.vision, min_pixels=16,
                                             max_pixels=16384))
    from PIL import Image
    img = Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8))
    out = backend.generate([img], "describe this scan", system="be brief",
                           max_new_tokens=5, temperature=0.0)
    assert isinstance(out, str) and out  # decoded text

    # golden via HF generate on the identical expanded prompt
    text = backend._render_chat(1, "describe this scan", "be brief")
    proc = backend.image_processor(images=[np.asarray(img)],
                                   return_tensors="np")
    merge = mycfg.vision.spatial_merge_size
    g = tuple(int(x) for x in proc["image_grid_thw"][0])
    ids = tok(text)["input_ids"]
    ids = backend._expand_image_tokens(ids, [g[0] * g[1] * g[2] // merge ** 2])
    model.generation_config.eos_token_id = None
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(proc["pixel_values"]),
            image_grid_thw=torch.tensor([list(g)]),
            max_new_tokens=5, do_sample=False)
    expected_tokens = hf_out[0, len(ids):].numpy().tolist()
    assert len(expected_tokens) == 5
    assert out == tok.decode(expected_tokens)


def test_generate_batch_matches_sequential(tiny, rng):
    """Heterogeneous batched generation (different prompt lengths AND
    different image grids per row, one prefill+decode) must reproduce
    the single-request path token-for-token: per-row true_lens mask the
    padding, the flat image table gathers row-major
    (models/qwen3_vl.visual_gather_indices)."""
    model, cfg, params = tiny
    mycfg = my_config(cfg)

    class NoEosTokenizer(ToyTokenizer):
        eos_token_id = -1  # never generated

    tok = NoEosTokenizer()
    backend = QwenVLBackend(
        model_path=None, config=mycfg, params=params, tokenizer=tok,
        image_processor=make_image_processor(mycfg.vision, min_pixels=16,
                                             max_pixels=16384))
    from PIL import Image
    img_a = Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8))
    img_b = Image.fromarray((rng.rand(24, 24, 3) * 255).astype(np.uint8))
    requests = [
        {"images": [img_a], "prompt": "describe this scan"},
        {"images": [img_b],
         "prompt": "is this chest CT consistent with the label PJP"},
        {"images": [], "prompt": "text only row"},
    ]
    sequential = [backend.generate(r["images"], r["prompt"],
                                   max_new_tokens=5, temperature=0.0)
                  for r in requests]
    batched = backend.generate_batch(requests, max_new_tokens=5,
                                     temperature=0.0)
    assert batched == sequential
