"""Tensor-parallel serving must emit EXACTLY the single-device streams.

The mesh changes WHERE the math runs (params column/row-sharded over
the ``model`` axis per training/sharding_rules.py, KV caches sharded on
the kv-head axis per models/qwen3_vl.kv_cache_sharding_specs), never
WHAT is computed — so the strongest test is token-for-token equality
between the TP path and the plain single-device path, across the
generator, the continuous batcher, shared-prefix refills and int8 KV.

This is the serving story for the bf16 8B judge (16.1 GiB params
exceed one v5e chip; the reference's nearest feature is HF
``device_map="auto"`` layer placement,
/root/reference/encoders/qwen3_vl_8b_thinking_encoder.py:34).
"""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from emr2a_tpu.models.qwen3_vl import (
    Qwen3VLGenerator,
    kv_cache_sharding_specs,
)
from emr2a_tpu.models.serving import ContinuousBatcher
from emr2a_tpu.parallel.mesh import create_mesh
from emr2a_tpu.training import param_shardings
from tests.test_serving import plain_rows, text_requests
from tests.test_speculative import init_params, tiny_config


def tp_mesh():
    # data=4 x model=2: the tiny config's 2 kv heads shard over model
    return create_mesh((4, 2))


def shard(params, mesh):
    return jax.tree_util.tree_map(
        jax.device_put, params, param_shardings(params, mesh))


@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_generator_tp_token_parity(mesh8, kv_dtype):
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    ids = np.asarray(text_requests(1, seed=11)[0]["input_ids"])

    plain = Qwen3VLGenerator(model, params, eos_token_id=-1,
                             kv_dtype=kv_dtype)
    want = plain.generate(ids, max_new_tokens=8, prompt_bucket=16)

    mesh = tp_mesh()
    sharded = shard(params, mesh)
    gen = Qwen3VLGenerator(model, sharded, eos_token_id=-1,
                           kv_dtype=kv_dtype, mesh=mesh)
    got = gen.generate(ids, max_new_tokens=8, prompt_bucket=16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_generator_tp_chunked_prefill_parity(mesh8):
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    ids = np.asarray(text_requests(1, seed=13)[0]["input_ids"])

    plain = Qwen3VLGenerator(model, params, eos_token_id=-1)
    want = plain.generate(ids, max_new_tokens=6, prompt_bucket=16)

    mesh = tp_mesh()
    gen = Qwen3VLGenerator(model, shard(params, mesh), eos_token_id=-1,
                           prefill_chunk=4, mesh=mesh)
    got = gen.generate(ids, max_new_tokens=6, prompt_bucket=16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_batcher_tp_token_parity(mesh8):
    """Continuous serving on the mesh: more requests than slots, slots
    at different depths, refills mid-wave — every stream identical to
    the plain single-device generator."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    reqs = text_requests(5, seed=17)
    budgets = [8] * len(reqs)
    expected = plain_rows(model, params, reqs, budgets, eos=-1)

    mesh = tp_mesh()
    srv = ContinuousBatcher(model, shard(params, mesh), n_slots=2,
                            prompt_bucket=16, max_new_tokens=8,
                            eos_token_id=-1, chunk=3, mesh=mesh)
    got = srv.serve(reqs, max_new_tokens=8)
    for i, (g, e) in enumerate(zip(got, expected)):
        np.testing.assert_array_equal(g, e, err_msg=f"request {i}")


def test_batcher_tp_shared_prefix_parity(mesh8):
    """Shared-prefix waves on the mesh: the once-per-wave prefix cache
    (1 row, built inside its own jit) and its Bp-row broadcast under
    every suffix refill both stay head-sharded and token-exact."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    rng = np.random.RandomState(23)
    prefix = rng.randint(2, 100, (20,), np.int64)  # > _MIN_SHARED_PREFIX
    reqs = [{"input_ids": np.concatenate(
        [prefix, rng.randint(2, 100, (3 + i,), np.int64)])[None]}
        for i in range(4)]
    budgets = [7] * len(reqs)
    expected = plain_rows(model, params, reqs, budgets, eos=-1)

    mesh = tp_mesh()
    srv = ContinuousBatcher(model, shard(params, mesh), n_slots=2,
                            prompt_bucket=32, max_new_tokens=7,
                            eos_token_id=-1, chunk=3, mesh=mesh)
    got = srv.serve(reqs, max_new_tokens=7)
    assert srv._wave_lp == 0  # released post-wave; sharing ran in-wave
    for i, (g, e) in enumerate(zip(got, expected)):
        np.testing.assert_array_equal(g, e, err_msg=f"request {i}")


def test_backend_tp_matches_single_device(mesh8, rng):
    """The user-reachable composition (step4 --tp N): QwenVLBackend
    shards its own params over the mesh and both generate_batch and
    generate_stream emit exactly the tp=1 text — including the vision
    tower and multimodal KV."""
    pytest.importorskip("torch")
    from tests.test_serving import tiny_backend

    plain = tiny_backend()
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    requests = [{"images": [img], "prompt": p}
                for p in ("describe", "what is this", "findings please")]
    want_batch = plain.generate_batch(requests, max_new_tokens=6)

    be = tiny_backend()
    # rebuild with tp=2 over the 8 virtual devices, reusing the
    # already-converted params/config (no torch re-run)
    from emr2a_tpu.judge.qwen_backend import QwenVLBackend
    be = QwenVLBackend(None, config=be.config,
                       params=be.generator.params,
                       tokenizer=be.tokenizer,
                       image_processor=be.image_processor,
                       prompt_bucket=32, tp=2)
    assert be.mesh is not None
    assert dict(zip(be.mesh.axis_names, be.mesh.devices.shape)) == {
        "data": 4, "model": 2}
    got_batch = be.generate_batch(requests, max_new_tokens=6)
    assert got_batch == want_batch
    got_stream = be.generate_stream(requests, max_new_tokens=6, n_slots=2)
    assert got_stream == want_batch


def test_kv_cache_sharded_on_heads(mesh8):
    """The slot cache is PLACED head-sharded (eager device_put in
    _init_state) and the spec helper degrades to replicated when the
    axis does not divide num_kv_heads."""
    cfg = tiny_config()
    model, params = init_params(cfg, 0)
    mesh = tp_mesh()

    val, scale = kv_cache_sharding_specs(cfg.text, mesh)
    assert val == P(None, None, "model", None)
    assert scale == P(None, None, "model")

    srv = ContinuousBatcher(model, shard(params, mesh), n_slots=2,
                            prompt_bucket=16, max_new_tokens=4,
                            eos_token_id=-1, chunk=2, kv_dtype="int8",
                            mesh=mesh)
    state = srv._init_state()
    k_buf, k_scale = state["cache"][0][0], state["cache"][0][1]
    assert k_buf.sharding.spec == P(None, None, "model", None)
    assert k_scale.sharding.spec == P(None, None, "model")

    # 3 kv heads on a model=2 axis: replicated fallback (weight-only TP)
    class OddCfg:
        num_kv_heads = 3
    val, scale = kv_cache_sharding_specs(OddCfg, mesh)
    assert val == P() and scale == P()
    # and no mesh at all is a clean no-op
    val, scale = kv_cache_sharding_specs(cfg.text, None)
    assert val == P() and scale == P()
