"""Continuous batching must emit EXACTLY each request's B=1 greedy
stream.

The ContinuousBatcher reorders *scheduling* (slots, chunked decode,
refill) but never the per-request math, so the strongest test needs no
real weights: serve a staggered mix of requests and require
token-for-token equality with Qwen3VLGenerator run one request at a
time — across more-requests-than-slots, heterogeneous prompt lengths,
eos stops mid-stream, per-request budgets, int8 KV, and multimodal
rows.
"""

import numpy as np
import pytest

from emr2a_tpu.models.qwen3_vl import Qwen3VLGenerator
from emr2a_tpu.models.serving import ContinuousBatcher
from tests.test_speculative import init_params, tiny_config


def plain_rows(model, params, requests, budgets, eos, kv_dtype="bf16"):
    gen = Qwen3VLGenerator(model, params, eos_token_id=eos,
                           kv_dtype=kv_dtype)
    outs = []
    for req, budget in zip(requests, budgets):
        ids = np.asarray(req["input_ids"]).reshape(1, -1)
        out = gen.generate(
            ids, pixel_patches=req.get("pixel_patches"),
            grid_thw=tuple(req.get("grid_thw", ()) or ()),
            max_new_tokens=budget, prompt_bucket=16)
        outs.append(out[0])
    return outs


def text_requests(n, seed=0):
    rng = np.random.RandomState(seed)
    reqs = []
    for i in range(n):
        length = 5 + (i * 3) % 9  # heterogeneous prompt lengths
        reqs.append({"input_ids": rng.randint(2, 100, (1, length), np.int64)})
    return reqs


def test_continuous_matches_plain_more_requests_than_slots():
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    reqs = text_requests(7)
    budgets = [10] * len(reqs)

    expected = plain_rows(model, params, reqs, budgets, eos=-1)
    srv = ContinuousBatcher(model, params, n_slots=3, prompt_bucket=16,
                            max_new_tokens=10, eos_token_id=-1, chunk=4)
    got = srv.serve(reqs, max_new_tokens=10)
    for i, (g, e) in enumerate(zip(got, expected)):
        np.testing.assert_array_equal(g, e, err_msg=f"request {i}")


def test_continuous_eos_and_budgets():
    """Stops mid-stream: pick real emitted tokens as the eos id so rows
    finish at different chunks and slots get refilled; also exercise
    per-request budgets."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    reqs = text_requests(5, seed=3)

    probe = Qwen3VLGenerator(model, params, eos_token_id=-1)
    streams = [probe.generate(np.asarray(r["input_ids"]), max_new_tokens=12,
                              prompt_bucket=16)[0] for r in reqs]
    # the 4th token of request 0's stream stops everyone who emits it
    eos = int(streams[0][3])

    budgets = [12, 4, 12, 7, 12]
    for i, r in enumerate(reqs):
        r["max_new_tokens"] = budgets[i]
    expected = plain_rows(model, params, reqs, budgets, eos=eos)
    srv = ContinuousBatcher(model, params, n_slots=2, prompt_bucket=16,
                            max_new_tokens=12, eos_token_id=eos, chunk=3)
    got = srv.serve(reqs)
    for i, (g, e) in enumerate(zip(got, expected)):
        np.testing.assert_array_equal(g, e, err_msg=f"request {i}")


def test_continuous_int8_kv():
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    reqs = text_requests(4, seed=5)
    budgets = [8] * 4
    expected = plain_rows(model, params, reqs, budgets, eos=-1,
                          kv_dtype="int8")
    srv = ContinuousBatcher(model, params, n_slots=2, prompt_bucket=16,
                            max_new_tokens=8, eos_token_id=-1,
                            kv_dtype="int8", chunk=4)
    got = srv.serve(reqs, max_new_tokens=8)
    for i, (g, e) in enumerate(zip(got, expected)):
        np.testing.assert_array_equal(g, e, err_msg=f"request {i}")


def test_continuous_chunked_prefill_matches_plain():
    """prefill_chunk on the batcher (sequence-chunked refill prefills)
    must not change any emitted token — the chunked pass is bit-equal
    to the one-shot prefill."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    reqs = text_requests(5, seed=7)
    budgets = [9] * len(reqs)
    expected = plain_rows(model, params, reqs, budgets, eos=-1)
    srv = ContinuousBatcher(model, params, n_slots=2, prompt_bucket=16,
                            max_new_tokens=9, eos_token_id=-1, chunk=4,
                            prefill_chunk=4)
    got = srv.serve(reqs, max_new_tokens=9)
    for i, (g, e) in enumerate(zip(got, expected)):
        np.testing.assert_array_equal(g, e, err_msg=f"request {i}")


def test_continuous_multimodal_mixed_with_text():
    cfg = tiny_config()
    model, params = init_params(cfg, 0, with_vision=True)

    rng = np.random.RandomState(0)
    grid = ((1, 4, 4),)
    n_img = 4 * 4 // (2 * 2)
    pixels = rng.randn(16, 4 * 4 * 3 * 1).astype(np.float32)
    mm = {"input_ids": np.array(
        [[5, 6] + [120] * n_img + [9, 2]], np.int64),
        "pixel_patches": pixels, "grid_thw": grid}
    reqs = [mm] + text_requests(2, seed=8) + [dict(mm)]
    budgets = [6] * len(reqs)

    expected = plain_rows(model, params, reqs, budgets, eos=-1)
    srv = ContinuousBatcher(model, params, n_slots=2, prompt_bucket=16,
                            max_new_tokens=6, eos_token_id=-1, chunk=2)
    got = srv.serve(reqs, max_new_tokens=6)
    for i, (g, e) in enumerate(zip(got, expected)):
        np.testing.assert_array_equal(g, e, err_msg=f"request {i}")


def test_continuous_mixed_sampling():
    """Slots with mixed temperatures serve in one stream: greedy rows
    (temp 0) must STILL exactly match the plain generator even when
    sharing chunks with sampled rows, and sampled rows must be
    deterministic given their seed and in-vocabulary."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    greedy_reqs = text_requests(2, seed=11)
    sampled_reqs = [dict(r, temperature=0.9, top_p=0.8, seed=100 + i)
                    for i, r in enumerate(text_requests(2, seed=13))]
    # interleave so greedy and sampled rows share decode chunks
    reqs = [greedy_reqs[0], sampled_reqs[0], greedy_reqs[1],
            sampled_reqs[1]]
    budgets = [9] * 4

    expected_greedy = plain_rows(model, params, greedy_reqs,
                                 [9, 9], eos=-1)
    srv = ContinuousBatcher(model, params, n_slots=3, prompt_bucket=16,
                            max_new_tokens=9, eos_token_id=-1, chunk=3)
    got = srv.serve(reqs, max_new_tokens=9)
    np.testing.assert_array_equal(got[0], expected_greedy[0])
    np.testing.assert_array_equal(got[2], expected_greedy[1])
    for s in (1, 3):
        assert got[s].min() >= 0 and got[s].max() < 128, got[s]
    # same seeds -> same sampled streams on a repeat serve
    again = srv.serve(reqs, max_new_tokens=9)
    for i, (g, e) in enumerate(zip(again, got)):
        np.testing.assert_array_equal(g, e, err_msg=f"request {i}")


def tiny_backend():
    """Real QwenVLBackend over the tiny random-init HF geometry."""
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
    return QwenVLBackend(None, config=mycfg, params=params,
                         tokenizer=ToyTokenizer(), image_processor=proc,
                         prompt_bucket=32)


def test_backend_generate_stream_matches_batch(rng):
    """QwenVLBackend.generate_stream (continuous slots) must emit the
    same greedy text per request as generate_batch (static batch) —
    scheduling changes, math doesn't."""
    be = tiny_backend()
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    requests = [{"images": [img], "prompt": p}
                for p in ("describe", "what is this", "findings please")]
    batch = be.generate_batch(requests, max_new_tokens=8)
    stream = be.generate_stream(requests, max_new_tokens=8, n_slots=2)
    assert stream == batch, (stream, batch)

    # per-request sampling plumbing: a sampled row sharing slots must
    # not perturb the greedy rows, and must be seed-deterministic
    mixed = requests + [dict(requests[0], temperature=0.8, top_p=0.9,
                             seed=7)]
    out1 = be.generate_stream(mixed, max_new_tokens=8, n_slots=2)
    assert out1[:3] == batch, (out1[:3], batch)
    out2 = be.generate_stream(mixed, max_new_tokens=8, n_slots=2)
    assert out1 == out2

    # per-request max_new_tokens caps that row's budget: its greedy
    # stream is the first 4 tokens of the full-budget stream (the
    # ToyTokenizer decodes one word per token)
    short = be.generate_stream([dict(requests[0], max_new_tokens=4)],
                               max_new_tokens=8, n_slots=2)[0]
    full_words = batch[0].split()
    assert short.split() == full_words[:min(4, len(full_words))]

    # standardize_images must treat numpy inputs as images to convert,
    # not call np.ndarray.resize (in-place, returns None) — empty
    # output is fine (random net may emit eos first), crashing is not
    be.standardize_images = 16
    out = be.generate(requests[0]["images"], requests[0]["prompt"],
                      max_new_tokens=4)
    assert isinstance(out, str)
    be.standardize_images = None

    # with a draft loaded (the target drafting for itself), an
    # all-greedy wave serves through SPECULATIVE continuous batching
    # and must still emit exactly the static-batch greedy text
    from emr2a_tpu.models.speculative import SpeculativeGenerator
    be.spec_generator = SpeculativeGenerator(
        be.generator.model, be.generator.params, be.generator.model,
        be.generator.params, spec_k=2,
        eos_token_id=be.generator.eos_token_id)
    spec_stream = be.generate_stream(requests, max_new_tokens=8, n_slots=2)
    assert spec_stream == batch, (spec_stream, batch)


def test_continuous_rejects_overlong_prompt():
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    srv = ContinuousBatcher(model, params, n_slots=2, prompt_bucket=8,
                            max_new_tokens=4, eos_token_id=-1)
    with pytest.raises(ValueError, match="bucket"):
        srv.serve([{"input_ids": np.zeros((1, 9), np.int64)}],
                  max_new_tokens=4)


def test_audit_continuous_through_real_backend(rng, tmp_path):
    """The full composition: VLMAuditModule.audit_batch with
    serving="continuous" over the REAL tiny-geometry backend (audit
    evidence packaging -> generate_stream -> ContinuousBatcher ->
    parser waterfall) must produce the same audit results as the
    static batched path — and run at all, which no fake-backend test
    can prove."""
    from PIL import Image
    from emr2a_tpu.judge.audit import VLMAuditModule

    records = []
    for i in range(3):
        pdir = tmp_path / f"p{i}"
        pdir.mkdir()
        slices = []
        for s in range(2):
            p = pdir / f"{s}.png"
            Image.fromarray(
                (rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(p)
            slices.append(str(p))
        records.append({"patient_id": f"p{i}", "label": "PJP",
                        "slices": slices, "meta": {"sex": "M", "age": "50"}})
    neighbors = [[("p1", "PJP", 0.9)]] * 3
    kwargs = dict(
        retrieval_predictions=["PJP", "Viral", "Normal"],
        retrieval_similarities=[[0.9]] * 3,
        retrieval_labels=[["PJP"]] * 3,
        query_patients=records, top_neighbors_list=neighbors,
        manifest=records, max_new_tokens=6)

    be = tiny_backend()
    static = VLMAuditModule(backend=be).audit_batch(
        output_dir=tmp_path / "a", vlm_batch_size=2, **kwargs)
    streamed = VLMAuditModule(backend=be).audit_batch(
        output_dir=tmp_path / "b", vlm_batch_size=2, serving="continuous",
        **kwargs)
    assert streamed["audit_results"] == static["audit_results"]
    assert len(streamed["audit_results"]) == 3
    # random weights parse to the safe default, never crash the batch
    for r in streamed["audit_results"]:
        assert r["final_decision"] in ("accept", "reject", "abstain")


@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_spec_continuous_matches_plain(kv_dtype):
    """Speculative continuous batching (per-slot draft-k/verify-1
    cycles) must emit EXACTLY each request's plain greedy stream —
    with a disagreeing draft (worst case: every cycle emits one
    token) AND with the target drafting for itself (every cycle
    accepts all k proposals, stressing the multi-token advance);
    composed with the s8 KV cache too."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    dmodel, dparams = init_params(cfg, 7)
    reqs = text_requests(5, seed=21)
    budgets = [10, 4, 12, 7, 9]
    for i, r in enumerate(reqs):
        r["max_new_tokens"] = budgets[i]
    expected = plain_rows(model, params, reqs, budgets, eos=-1,
                          kv_dtype=kv_dtype)
    for dm, dp in ((dmodel, dparams), (model, params)):
        srv = ContinuousBatcher(model, params, n_slots=2, prompt_bucket=16,
                                max_new_tokens=12, eos_token_id=-1, chunk=3,
                                draft_model=dm, draft_params=dp, spec_k=2,
                                kv_dtype=kv_dtype)
        got = srv.serve(reqs)
        for i, (g, e) in enumerate(zip(got, expected)):
            np.testing.assert_array_equal(g, e, err_msg=f"request {i}")


def test_spec_continuous_eos_and_refill():
    """eos stops mid-stream under speculation: rows finish at
    different cycles and free their slots for queued requests; the
    emitted streams still match the plain generator with the same
    eos."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    dmodel, dparams = init_params(cfg, 3)
    reqs = text_requests(6, seed=4)

    probe = Qwen3VLGenerator(model, params, eos_token_id=-1)
    streams = [probe.generate(np.asarray(r["input_ids"]), max_new_tokens=10,
                              prompt_bucket=16)[0] for r in reqs]
    eos = int(streams[1][2])

    budgets = [10] * 6
    expected = plain_rows(model, params, reqs, budgets, eos=eos)
    srv = ContinuousBatcher(model, params, n_slots=2, prompt_bucket=16,
                            max_new_tokens=10, eos_token_id=eos, chunk=2,
                            draft_model=dmodel, draft_params=dparams,
                            spec_k=3)
    got = srv.serve(reqs, max_new_tokens=10)
    for i, (g, e) in enumerate(zip(got, expected)):
        np.testing.assert_array_equal(g, e, err_msg=f"request {i}")


def test_spec_continuous_mixed_sampling():
    """A draft-enabled batcher serves mixed greedy/sampled waves:
    greedy rows stay token-exact vs the plain generator (the point-mass
    degeneracy of the rejection-sampling rule), sampled rows are
    deterministic per seed.  Distribution-exactness of the sampled rows
    is pinned in tests/test_sampled_speculative.py."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    dmodel, dparams = init_params(cfg, 3)
    greedy_reqs = text_requests(2, seed=11)
    sampled_reqs = [dict(r, temperature=0.9, top_p=0.8, seed=50 + i)
                    for i, r in enumerate(text_requests(2, seed=12))]
    reqs = [greedy_reqs[0], sampled_reqs[0], greedy_reqs[1],
            sampled_reqs[1]]
    budgets = [8] * len(reqs)
    expected_greedy = plain_rows(model, params, greedy_reqs, [8, 8], eos=-1)

    srv = ContinuousBatcher(model, params, n_slots=2, prompt_bucket=16,
                            max_new_tokens=8, eos_token_id=-1, chunk=2,
                            draft_model=dmodel, draft_params=dparams,
                            spec_k=2)
    got = srv.serve(reqs, max_new_tokens=8)
    np.testing.assert_array_equal(got[0], expected_greedy[0])
    np.testing.assert_array_equal(got[2], expected_greedy[1])
    # same seeds -> same sampled streams on a repeat serve
    again = srv.serve(reqs, max_new_tokens=8)
    np.testing.assert_array_equal(got[1], again[1])
    np.testing.assert_array_equal(got[3], again[3])


def test_audit_continuous_speculative_real_backend(rng, tmp_path):
    """step4's --draft_model + --serving continuous composition: the
    audit module streams through SPECULATIVE continuous batching (the
    tiny backend drafting for itself = full acceptance) and must
    produce the same audit results as the plain continuous path."""
    from PIL import Image
    from emr2a_tpu.judge.audit import VLMAuditModule
    from emr2a_tpu.models.speculative import SpeculativeGenerator

    records = []
    for i in range(3):
        pdir = tmp_path / f"p{i}"
        pdir.mkdir()
        p = pdir / "0.png"
        Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(p)
        records.append({"patient_id": f"p{i}", "label": "PJP",
                        "slices": [str(p)], "meta": {"sex": "M"}})
    kwargs = dict(
        retrieval_predictions=["PJP", "Viral", "Normal"],
        retrieval_similarities=[[0.9]] * 3,
        retrieval_labels=[["PJP"]] * 3,
        query_patients=records,
        top_neighbors_list=[[("p1", "PJP", 0.9)]] * 3,
        manifest=records, max_new_tokens=6, vlm_batch_size=2,
        serving="continuous")

    be = tiny_backend()
    plain = VLMAuditModule(backend=be).audit_batch(
        output_dir=tmp_path / "a", **kwargs)
    be.spec_generator = SpeculativeGenerator(
        be.generator.model, be.generator.params, be.generator.model,
        be.generator.params, spec_k=2,
        eos_token_id=be.generator.eos_token_id)
    spec = VLMAuditModule(backend=be).audit_batch(
        output_dir=tmp_path / "b", **kwargs)
    assert spec["audit_results"] == plain["audit_results"]


# -- shared-prefix KV (one prefix prefill per wave) ------------------------


def prefix_requests(n, prefix_len=17, seed=0, bucket=32):
    """Requests opening with an identical token prefix (the audit
    workload: one constant instruction template across cases) plus a
    heterogeneous per-request suffix."""
    rng = np.random.RandomState(seed)
    prefix = rng.randint(2, 100, (prefix_len,), np.int64)
    reqs = []
    for i in range(n):
        tail = rng.randint(2, 100, (3 + (i * 2) % 7,), np.int64)
        ids = np.concatenate([prefix, tail])[None]
        assert ids.shape[1] <= bucket
        reqs.append({"input_ids": ids})
    return reqs


def test_shared_prefix_matches_plain():
    """A wave sharing a >=16-token prefix serves through the shared-
    prefix path (prefix prefilled once, per-case suffix prefills) and
    must STILL emit exactly each request's plain greedy stream."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    reqs = prefix_requests(5)
    budgets = [9] * len(reqs)
    expected = [
        Qwen3VLGenerator(model, params, eos_token_id=-1).generate(
            np.asarray(r["input_ids"]), max_new_tokens=9,
            prompt_bucket=32)[0]
        for r in reqs]
    srv = ContinuousBatcher(model, params, n_slots=2, prompt_bucket=32,
                            max_new_tokens=9, eos_token_id=-1, chunk=3)
    assert srv._shared_prefix_len(reqs) == 17
    got = srv.serve(reqs, max_new_tokens=9)
    # sharing actually ran (a prefix program was compiled for Lp=17)
    assert (17, False) in srv._prefix_fns
    for i, (g, e) in enumerate(zip(got, expected)):
        np.testing.assert_array_equal(g, e, err_msg=f"request {i}")
    # prefix caches are wave-scoped, released after serve
    assert srv._wave_prefix is None and srv._wave_lp == 0

    # disabling sharing serves the same tokens through whole prefills
    off = ContinuousBatcher(model, params, n_slots=2, prompt_bucket=32,
                            max_new_tokens=9, eos_token_id=-1, chunk=3,
                            shared_prefix=False)
    got_off = off.serve(reqs, max_new_tokens=9)
    assert not off._prefix_fns
    for i, (g, e) in enumerate(zip(got_off, expected)):
        np.testing.assert_array_equal(g, e, err_msg=f"request {i}")


def test_shared_prefix_multimodal_suffix():
    """Images live in the per-case suffix (the audit evidence package);
    the shared text prefix splices under multimodal rows without
    perturbing the vision splice / deepstack math."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0, with_vision=True)
    rng = np.random.RandomState(0)
    prefix = rng.randint(2, 100, (18,), np.int64).tolist()
    grid = ((1, 4, 4),)
    n_img = 4 * 4 // (2 * 2)
    reqs = []
    for i in range(4):
        pixels = rng.randn(16, 4 * 4 * 3 * 1).astype(np.float32)
        ids = np.array([prefix + [120] * n_img + [9 + i, 2]], np.int64)
        reqs.append({"input_ids": ids, "pixel_patches": pixels,
                     "grid_thw": grid})
    budgets = [7] * len(reqs)
    expected = plain_rows(model, params, reqs, budgets, eos=-1)

    srv = ContinuousBatcher(model, params, n_slots=2, prompt_bucket=32,
                            max_new_tokens=7, eos_token_id=-1, chunk=2)
    assert srv._shared_prefix_len(reqs) == 18
    got = srv.serve(reqs, max_new_tokens=7)
    assert (18, False) in srv._prefix_fns
    for i, (g, e) in enumerate(zip(got, expected)):
        np.testing.assert_array_equal(g, e, err_msg=f"request {i}")


def test_shared_prefix_int8_kv_and_chunked():
    """Shared prefix composes with the s8 KV cache and sequence-chunked
    suffix prefills (chunk rounded to a divisor of the suffix)."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    reqs = prefix_requests(4, prefix_len=20, seed=2)
    budgets = [8] * len(reqs)
    expected = [
        Qwen3VLGenerator(model, params, eos_token_id=-1,
                         kv_dtype="int8").generate(
            np.asarray(r["input_ids"]), max_new_tokens=8,
            prompt_bucket=32)[0]
        for r in reqs]
    srv = ContinuousBatcher(model, params, n_slots=2, prompt_bucket=32,
                            max_new_tokens=8, eos_token_id=-1, chunk=3,
                            kv_dtype="int8", prefill_chunk=8)
    # suffix = 32 - 20 = 12; explicit chunk 8 rounds down to divisor 6
    assert srv._fit_chunk(12, 1) == 6
    got = srv.serve(reqs, max_new_tokens=8)
    for i, (g, e) in enumerate(zip(got, expected)):
        np.testing.assert_array_equal(g, e, err_msg=f"request {i}")


def test_fit_chunk_collapse_falls_back_to_auto():
    """An explicit prefill_chunk whose divisor floor collapses below
    half the request (prime suffix lengths floor all the way to C=1 —
    a one-token-per-step scan) is treated as unusable for that seq_len
    and the auto policy decides; near misses still round to a divisor.
    Token parity must hold through a prime-length suffix."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    srv = ContinuousBatcher(model, params, n_slots=2, prompt_bucket=32,
                            max_new_tokens=8, eos_token_id=-1,
                            prefill_chunk=8)
    assert srv._fit_chunk(12, 1) == 6      # divisor 6 >= 8/2: honored
    assert srv._fit_chunk(13, 1) != 1      # prime: no C=1 cliff
    assert srv._fit_chunk(31, 1) != 1

    # parity through the prime suffix (32 - 19 = 13), explicit chunk 8
    reqs = prefix_requests(4, prefix_len=19, seed=11)
    expected = [
        Qwen3VLGenerator(model, params, eos_token_id=-1).generate(
            np.asarray(r["input_ids"]), max_new_tokens=8,
            prompt_bucket=32)[0]
        for r in reqs]
    got = srv.serve(reqs, max_new_tokens=8)
    for i, (g, e) in enumerate(zip(got, expected)):
        np.testing.assert_array_equal(g, e, err_msg=f"request {i}")


def test_shared_prefix_speculative():
    """Shared prefix composes with the speculative chunk: both the
    target's AND the draft's prefix caches are prefilled once; greedy
    streams stay exactly the target's own decode."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    dmodel, dparams = init_params(cfg, 7)
    reqs = prefix_requests(4, prefix_len=19, seed=5)
    budgets = [8] * len(reqs)
    expected = [
        Qwen3VLGenerator(model, params, eos_token_id=-1).generate(
            np.asarray(r["input_ids"]), max_new_tokens=8,
            prompt_bucket=32)[0]
        for r in reqs]
    srv = ContinuousBatcher(model, params, n_slots=2, prompt_bucket=32,
                            max_new_tokens=8, eos_token_id=-1, chunk=2,
                            draft_model=dmodel, draft_params=dparams,
                            spec_k=2)
    got = srv.serve(reqs, max_new_tokens=8)
    assert (19, True) in srv._prefix_fns  # draft prefix prefilled too
    for i, (g, e) in enumerate(zip(got, expected)):
        np.testing.assert_array_equal(g, e, err_msg=f"request {i}")


def test_shared_prefix_detection_rules():
    """Sharing never extends into an image run (image-token KV depends
    on per-request pixels), requires every suffix non-empty, and is
    skipped for short prefixes and single-request waves."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    srv = ContinuousBatcher(model, params, n_slots=2, prompt_bucket=32,
                            max_new_tokens=4, eos_token_id=-1)
    img = cfg.image_token_id
    base = list(range(2, 22))
    # identical 28-token common region with an image run from position
    # 18: sharing clips to the pre-image prefix, never into the run
    with_img = base[:18] + [img] * 6 + base[18:]
    reqs = [{"input_ids": np.array([with_img + [30 + i]], np.int64)}
            for i in range(2)]
    assert srv._shared_prefix_len(reqs) == 18
    # an image run that starts before _MIN_SHARED_PREFIX disables it
    early = base[:10] + [img] * 6 + base[10:]
    reqs_early = [{"input_ids": np.array([early + [30 + i]], np.int64)}
                  for i in range(2)]
    assert srv._shared_prefix_len(reqs_early) == 0

    # one request is a strict prefix of the other: suffix must stay
    # non-empty, so the lcp is capped at min_len - 1
    reqs = [{"input_ids": np.array([base], np.int64)},
            {"input_ids": np.array([base + [50]], np.int64)}]
    assert srv._shared_prefix_len(reqs) == len(base) - 1

    # single-request waves and short prefixes never share
    assert srv._shared_prefix_len(reqs[:1]) == 0
    short = [{"input_ids": np.array([[5, 6, 7, 8 + i]], np.int64)}
             for i in range(2)]
    assert srv._shared_prefix_len(short) == 0


def test_refill_batch_policy_resolution():
    """The refill-batch policy resolves per wave: long whole-prompt
    suffixes serialize (measured slower to batch — prefill compute is
    row-linear), short shared-prefix suffixes batch under the ~1 GiB
    duplicate-KV cap; an explicit refill_batch overrides."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0)

    # short suffix (tiny bucket): auto batches up to n_slots
    srv = ContinuousBatcher(model, params, n_slots=3, prompt_bucket=16,
                            max_new_tokens=4, eos_token_id=-1)
    srv.serve(text_requests(2), max_new_tokens=2)
    assert srv.refill_batch == 3

    # long suffix: auto serializes
    import emr2a_tpu.models.serving as sv
    long_bucket = sv._BATCH_REFILL_MAX_SUFFIX + 16
    srv2 = ContinuousBatcher(model, params, n_slots=3,
                             prompt_bucket=long_bucket,
                             max_new_tokens=4, eos_token_id=-1)
    srv2.serve(text_requests(2), max_new_tokens=2)
    assert srv2.refill_batch == 1

    # ... unless the wave's shared prefix shrinks the suffix under the
    # threshold
    rng = np.random.RandomState(0)
    prefix = rng.randint(2, 100, (long_bucket - 32,), np.int64)
    preqs = [{"input_ids": np.concatenate(
        [prefix, rng.randint(2, 100, (4 + i,), np.int64)])[None]}
        for i in range(2)]
    srv3 = ContinuousBatcher(model, params, n_slots=3,
                             prompt_bucket=long_bucket,
                             max_new_tokens=4, eos_token_id=-1)
    srv3.serve(preqs, max_new_tokens=2)
    assert srv3.refill_batch == 3

    # explicit override wins
    srv4 = ContinuousBatcher(model, params, n_slots=3, prompt_bucket=16,
                             max_new_tokens=4, eos_token_id=-1,
                             refill_batch=1)
    srv4.serve(text_requests(2), max_new_tokens=2)
    assert srv4.refill_batch == 1


def test_ring_decode_matches_per_row_layout():
    """The uniform-ring decode KV layout (default; scalar write offset
    -> dynamic-update-slice, the fix for the ~2.6 ms/step continuous
    program tax, BENCH_decode_tax.json) must be token-identical to the
    per-row-offset layout across refills, mixed sampling, and ring
    wrap-around (7 requests over 2 slots runs the global step counter
    well past R = max_len - prompt_bucket)."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    reqs = text_requests(7, seed=11)
    reqs[2]["temperature"] = 0.9
    reqs[5]["temperature"] = 0.7

    kw = dict(n_slots=2, prompt_bucket=16, max_new_tokens=9,
              eos_token_id=-1, chunk=3)
    ring = ContinuousBatcher(model, params, **kw)
    assert ring.ring_decode  # the default layout
    flat = ContinuousBatcher(model, params, ring_decode=False, **kw)
    assert not flat.ring_decode
    got_r = ring.serve(reqs, max_new_tokens=9)
    got_f = flat.serve(reqs, max_new_tokens=9)
    for i, (g, e) in enumerate(zip(got_r, got_f)):
        np.testing.assert_array_equal(g, e, err_msg=f"request {i}")
