"""Judge-path generation benchmark at Qwen3-VL-2B shapes, real chip.

VERDICT r1 weak #3: the audit path's hot loop is VLM generation
(/root/reference/pipelines/step4_vlm_review/vlm_audit_module.py:249-364)
and round 1 shipped zero measured numbers for it.  This measures, with
random-init weights at 2B-class shapes (perf is weight-agnostic):

- vision tower forward for one 448x448 image (256 merged tokens),
- prefill latency at the 1024-token prompt bucket,
- decode tokens/s (isolated as (t(max_new=96) - t(max_new=32)) / 64).

The whole prefill+decode runs as ONE jitted call (Qwen3VLGenerator),
so the ~30 ms relay RTT is subtracted once per measurement.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _t(f):
    t0 = time.time()
    f()
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--what", default="all", help="comma list: text,vision")
    ap.add_argument("--precision", default="bf16", choices=["bf16", "int8"])
    args = ap.parse_args()
    what = set(args.what.split(","))

    from emr2a_tpu.models.qwen3_vl import (
        Qwen3VLConfig, Qwen3VLGenerator, Qwen3VLModel, QwenTextConfig,
        QwenVisionConfig, QwenVisionTower, compute_mrope_position_ids)

    # Qwen3-VL-2B-class geometry (hidden 2048 / 28 layers / GQA 16:8 /
    # head_dim 128 / ffn 6144; vision: depth 24, hidden 1152, merge 2).
    cfg = Qwen3VLConfig(
        vision=QwenVisionConfig(
            depth=24, hidden_size=1152, intermediate_size=4304,
            num_heads=16, patch_size=16, temporal_patch_size=2,
            spatial_merge_size=2, out_hidden_size=2048,
            num_position_embeddings=2304, deepstack_visual_indexes=(5, 11, 17),
            dtype=jnp.bfloat16),
        text=QwenTextConfig(
            vocab_size=151936, hidden_size=2048,
            num_layers=args.layers, num_heads=16, num_kv_heads=8,
            head_dim=128, intermediate_size=6144,
            mrope_section=(24, 20, 20), dtype=jnp.bfloat16))

    rtt = None

    def measure(fn, n=3):
        nonlocal rtt
        if rtt is None:
            @jax.jit
            def empty(x):
                return x + 1.0
            float(empty(jnp.float32(0)))
            rtt = min(_t(lambda: float(empty(jnp.float32(i))))
                      for i in range(1, 4))
        return min(_t(fn) for _ in range(n)) - rtt

    if {"text", "all"} & what:
        model = Qwen3VLModel(cfg)
        print("init 2B text params on device...", flush=True)
        ids1 = jnp.zeros((1, 1), jnp.int32)
        pos1 = jnp.zeros((3, 1, 1), jnp.int32)
        params = jax.jit(lambda k: model.init(k, ids1, pos1)["params"])(
            jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        print(f"params: {n_params/1e9:.2f}B", flush=True)

        if args.precision == "int8":
            from emr2a_tpu.models.quantize import quantize_qwen_text_params
            params = {**params, "language_model":
                      quantize_qwen_text_params(params["language_model"])}
            params = jax.device_put(params)
            jax.block_until_ready(params)
        gen = Qwen3VLGenerator(model, params, eos_token_id=-1)  # never stop
        rng = np.random.RandomState(0)
        prompt = rng.randint(2, 150_000, (1, 980), np.int64)

        times = {}
        for max_new in (32, 96):
            t0 = time.time()
            gen.generate(prompt, max_new_tokens=max_new, prompt_bucket=1024)
            print(f"compile+run max_new={max_new}: {time.time()-t0:.1f}s",
                  flush=True)
            times[max_new] = measure(
                lambda mn=max_new: gen.generate(prompt, max_new_tokens=mn,
                                                prompt_bucket=1024))
        per_tok = (times[96] - times[32]) / 64
        prefill = times[32] - 32 * per_tok
        print(f"prefill @ bucket 1024 (980 real tokens): {prefill*1000:.1f} ms")
        print(f"decode: {per_tok*1000:.2f} ms/token = {1/per_tok:.1f} tok/s")
        bw = n_params * 2 / per_tok / 1e9
        print(f"decode param-bandwidth: {bw:.0f} GB/s (chip stream rate 853)")

    if {"vision", "all"} & what:
        tower = QwenVisionTower(cfg.vision)
        grid = ((1, 28, 28),)  # 448x448 -> 784 patches -> 196 merged tokens
        patches = jnp.asarray(
            np.random.RandomState(0).randn(784, cfg.vision.patch_dim),
            jnp.bfloat16)
        vparams = jax.jit(lambda k: tower.init(k, patches, grid))(
            jax.random.PRNGKey(1))["params"]
        jax.block_until_ready(vparams)

        @jax.jit
        def vfwd(p, x):
            out, _, _ = tower.apply({"params": p}, x, grid)
            return out.astype(jnp.float32).sum()

        float(vfwd(vparams, patches))
        dt = measure(lambda: float(vfwd(vparams, patches)))
        print(f"vision tower fwd 448x448 (24 layers): {dt*1000:.1f} ms")


if __name__ == "__main__":
    main()
