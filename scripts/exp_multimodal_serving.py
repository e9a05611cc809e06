"""Multimodal (image-bearing) batched audit serving at 8B, real chip.

Every earlier 8B serving bench was text-tokens-only.  The reference's
audit call sends ~7 images per case — 4 query slices + the first image
of the top-3 neighbors (/root/reference/pipelines/step4_vlm_review/
vlm_audit_module.py:249-364) — which at 448x448 is 196 merged visual
tokens each, so the REAL audit prompt is ~85% visual tokens.  This
measures the full multimodal composition on-chip:

  vision tower forward over B x n_images uniform 448^2 frames
  (batched per-frame attention — models/qwen3_vl.QwenVisionTower)
  -> visual-token gather/splice + deepstack injection
  -> auto-chunked batched prefill (int8 W8A8 decoder, int8 KV)
  -> batched greedy decode,

all inside ONE jitted generate per (bucket, max_new), so the ~30 ms
relay RTT is subtracted once per measurement.  Prefill is isolated the
same way the text benches do it: t(max_new=96) - t(max_new=32) gives
the per-token decode cost, extrapolated back to zero tokens.

A --n_images 0 control run at the SAME bucket isolates what the images
add to prefill (vision fwd + gather + deepstack) vs an equal-length
text-only prompt.

Usage (real chip):
  python scripts/exp_multimodal_serving.py --geometry 8b --batch 8 \
      --precision int8 --kv int8 --json_out BENCH_8b_multimodal.json
CPU smoke: --geometry tiny --batch 2.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from exp_qwen_generate import (_t, build_config,
                               materialize_quantized_on_device)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", default="8b",
                    choices=["tiny", "2b", "8b"])
    ap.add_argument("--precision", default="int8",
                    choices=["bf16", "int8", "int4"])
    ap.add_argument("--kv", default="int8", choices=["bf16", "int8"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_images", type=int, default=7,
                    help="images per case (reference evidence package: "
                         "4 query + 3 neighbors)")
    ap.add_argument("--image_side", type=int, default=448,
                    help="square image edge; 448 -> (1, 28, 28) grid "
                         "-> 196 merged tokens at 8B geometry")
    ap.add_argument("--bucket", type=int, default=None,
                    help="prompt bucket (default: fits n_images x "
                         "tokens + ~120 text, rounded up to 256)")
    ap.add_argument("--prefill_chunk", type=int, default=None)
    ap.add_argument("--continuous", action="store_true",
                    help="also serve 1.5x batch multimodal requests "
                         "through the ContinuousBatcher (ring decode, "
                         "shared instruction prefix, auto refill cap, "
                         "frame-batched vision) with audit-like output "
                         "budgets — the composed round-4/5 machinery "
                         "at this batch")
    ap.add_argument("--skip_static", action="store_true",
                    help="skip the static generate measurements "
                         "(continuous-only run)")
    ap.add_argument("--cont_slots", type=int, default=None,
                    help="continuous slot count (default: --batch)")
    ap.add_argument("--cont_max_budget", type=int, default=512,
                    help="cap the audit-like output budgets — bounds "
                         "max_len and so the continuous KV residency")
    ap.add_argument("--json_out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU platform (tiny-geometry smoke)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg = build_config(args.geometry)
    if args.geometry == "tiny":
        # the real image placeholder id (151655) is outside the tiny
        # 512-token vocab
        import dataclasses
        cfg = dataclasses.replace(cfg, image_token_id=500)
    from emr2a_tpu.models.qwen3_vl import (Qwen3VLGenerator, Qwen3VLModel,
                                           auto_prefill_chunk)
    model = Qwen3VLModel(cfg)
    vis = cfg.vision

    if args.geometry == "tiny":
        side = 8  # patch 4, merge 2 -> grid (1, 2, 2), 1 merged token
    else:
        side = args.image_side
    gh = gw = side // vis.patch_size
    grid = (1, gh, gw)
    tokens_per_image = gh * gw // vis.spatial_merge_size ** 2
    patches_per_image = gh * gw

    B, n_img = args.batch, args.n_images
    vocab_hi = cfg.text.vocab_size - 2
    rng = np.random.RandomState(0)

    # ids: ~90 tokens of instruction text, then n_img image runs each
    # separated by one text token (HF interleaves <|vision_start|>/
    # <|vision_end|> text tokens between images; adjacent runs would
    # merge in the m-rope run finder), then ~30 tokens of per-case text
    head = rng.randint(2, vocab_hi, (90,), np.int64)
    tail = rng.randint(2, vocab_hi, (30,), np.int64)
    # a random id can land on the image placeholder, which demands a
    # matching grid entry — remap
    head[head == cfg.image_token_id] = 2
    tail[tail == cfg.image_token_id] = 2
    row = list(head)
    for _ in range(n_img):
        row.append(3)  # vision_start stand-in
        row.extend([cfg.image_token_id] * tokens_per_image)
        row.append(4)  # vision_end stand-in
    row.extend(tail)
    seq = len(row)
    bucket = args.bucket or -(-seq // 256) * 256
    ids = np.tile(np.asarray(row, np.int64)[None], (B, 1))
    # heterogeneous tails: rows differ only in trailing text length
    true_lens = (None if B == 1 else
                 np.asarray([seq - 2 * (b % 4) for b in range(B)],
                            np.int32))

    print(f"{args.geometry} multimodal serving: B={B}, {n_img} x "
          f"{side}^2 images/case = {n_img * tokens_per_image} visual + "
          f"{seq - n_img * (tokens_per_image + 2)} text tokens "
          f"-> bucket {bucket}", flush=True)

    print(f"init params on device ({args.precision}, + vision tower "
          f"bf16)...", flush=True)
    if args.geometry == "8b":
        params = materialize_quantized_on_device(
            model, jax.random.PRNGKey(0), lm_head_int8=False,
            precision=args.precision, vision_grid=grid)
    else:
        n_tok = tokens_per_image
        ids1 = jnp.concatenate([
            jnp.zeros((1, 2), jnp.int32),
            jnp.full((1, n_tok), cfg.image_token_id, jnp.int32),
            jnp.zeros((1, 2), jnp.int32)], axis=1)
        pos1 = jnp.zeros((3, 1, ids1.shape[1]), jnp.int32)
        patches1 = jnp.zeros((patches_per_image, vis.patch_dim), vis.dtype)
        params = jax.jit(lambda k: jax.tree_util.tree_map(
            lambda x: (x.astype(jnp.bfloat16)
                       if x.dtype == jnp.float32 else x),
            model.init(k, ids1, pos1, pixel_patches=patches1,
                       grid_thw=(grid,))["params"]))(jax.random.PRNGKey(0))
        if args.precision in ("int8", "int4"):
            from emr2a_tpu.models.quantize import quantize_qwen_text_params
            params = {**params, "language_model":
                      quantize_qwen_text_params(params["language_model"],
                                                precision=args.precision)}
            params = jax.device_put(params)
    jax.block_until_ready(params)
    n_bytes = sum(x.size * x.dtype.itemsize
                  for x in jax.tree_util.tree_leaves(params))
    print(f"params resident: {n_bytes/2**30:.2f} GiB", flush=True)

    # pixel patches created ON device (jitted random) — a host
    # device_put of ~130 MB through the relay takes minutes
    n_patches = B * n_img * patches_per_image
    patches = jax.jit(
        lambda k: (jax.random.normal(
            k, (n_patches, vis.patch_dim), jnp.float32) * 0.5
        ).astype(vis.dtype))(jax.random.PRNGKey(1))
    jax.block_until_ready(patches)
    grids = (grid,) * (B * n_img)

    gen = Qwen3VLGenerator(model, params, eos_token_id=-1,
                           kv_dtype=args.kv,
                           prefill_chunk=args.prefill_chunk)

    records = []

    def emit(metric, value, unit, **extra):
        rec = {"metric": metric, "value": round(float(value), 3),
               "unit": unit, "geometry": args.geometry,
               "precision": args.precision, "kv": args.kv, "batch": B,
               "n_images": n_img, "bucket": bucket, **extra}
        records.append(rec)
        print(json.dumps(rec), flush=True)
        if args.json_out:
            with open(args.json_out, "a", encoding="utf-8") as f:
                f.write(json.dumps(rec) + "\n")

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

    lo, hi = (4, 12) if args.geometry == "tiny" else (32, 96)
    if args.prefill_chunk is None:
        ac = {mn: auto_prefill_chunk(B, cfg.text.num_heads, bucket,
                                     bucket + mn) for mn in (lo, hi)}
        if any(ac.values()):
            print(f"auto prefill_chunk per max_new: {ac}", flush=True)

    times = {}
    for max_new in (() if args.skip_static else (lo, hi)):
        t0 = time.time()
        gen.generate(ids, pixel_patches=patches, grid_thw=grids,
                     max_new_tokens=max_new, prompt_bucket=bucket,
                     true_lens=true_lens)
        print(f"compile+run max_new={max_new}: {time.time()-t0:.1f}s",
              flush=True)
        times[max_new] = measure(
            lambda mn=max_new: gen.generate(
                ids, pixel_patches=patches, grid_thw=grids,
                max_new_tokens=mn, prompt_bucket=bucket,
                true_lens=true_lens))
    if times:
        per_tok = (times[hi] - times[lo]) / (hi - lo)
        prefill = times[lo] - lo * per_tok
        print(f"multimodal prefill @ bucket {bucket} (B={B}, {n_img} "
              f"img): {prefill*1000:.1f} ms = {prefill*1000/B:.1f} "
              f"ms/case")
        print(f"decode: {per_tok*1000:.2f} ms/step = {B/per_tok:.1f} "
              f"tok/s aggregate")
        emit("mm_prefill", prefill * 1000, "ms")
        emit("mm_prefill_per_case", prefill * 1000 / B, "ms")
        emit("mm_decode", B / per_tok, "tok/s")

    if n_img > 0 and times:
        # text-only control at the SAME bucket: what the images add
        ids_t = ids.copy()
        ids_t[ids_t == cfg.image_token_id] = 5
        t0 = time.time()
        gen.generate(ids_t, max_new_tokens=lo, prompt_bucket=bucket,
                     true_lens=true_lens)
        print(f"compile text control: {time.time()-t0:.1f}s", flush=True)
        t_text = measure(lambda: gen.generate(
            ids_t, max_new_tokens=lo, prompt_bucket=bucket,
            true_lens=true_lens))
        vision_add = times[lo] - t_text
        print(f"vision+gather+deepstack adds {vision_add*1000:.1f} ms "
              f"({vision_add*1000/B:.1f} ms/case) over an equal-length "
              f"text prompt")
        emit("mm_vision_overhead_per_case", vision_add * 1000 / B, "ms")

    if args.continuous:
        # The composed serving stack at this slot count: every request
        # repeats the instruction head (shared-prefix candidate — the
        # batcher clips sharing before the first image run, exactly
        # the constant-block-first audit prompt layout), carries its
        # own n_img images, and draws an audit-like output budget.
        from emr2a_tpu.models.serving import ContinuousBatcher
        slots = args.cont_slots or B
        n_req = slots + slots // 2
        budgets = [min(args.cont_max_budget,
                       (64, 96, 128, 160, 192, 256, 320, 512)[i % 8])
                   for i in range(n_req)]
        ppi = patches_per_image
        reqs = []
        for i in range(n_req):
            tail_i = rng.randint(2, vocab_hi, (20 + i % 9,), np.int64)
            tail_i[tail_i == cfg.image_token_id] = 2
            r_ids = np.concatenate([np.asarray(row[:len(head)]),
                                    np.asarray(row[len(head):seq - 30]),
                                    tail_i])
            # HOST-resident patches: serve() holds every request for
            # the whole wave, so device-resident per-request patch
            # buffers would pin n_req x ~30 MB of HBM (measured OOM at
            # slots=32); the refill prefill uploads each request's
            # patches when its slot opens.
            reqs.append({
                "input_ids": r_ids[None],
                "pixel_patches": rng.randn(
                    n_img * ppi, vis.patch_dim).astype(np.float32) * 0.5,
                "grid_thw": (grid,) * n_img,
                "max_new_tokens": budgets[i],
            })
        srv = ContinuousBatcher(model, params, n_slots=slots,
                                prompt_bucket=bucket,
                                max_new_tokens=max(budgets),
                                eos_token_id=-1, kv_dtype=args.kv,
                                chunk=32)
        try:
            t0 = time.time()
            outs = srv.serve(reqs)
            compile_wall = time.time() - t0
            print(f"continuous wave 1 (compiles): {compile_wall:.1f}s",
                  flush=True)
            t0 = time.time()
            outs = srv.serve(reqs)
            wall = time.time() - t0
        except Exception as e:
            emit("mm_continuous_oom", 0, "note", requests=n_req,
                 slots=slots, max_budget=max(budgets),
                 error=repr(e)[:200])
            raise
        n_tok = sum(len(o) for o in outs)
        assert n_tok == sum(budgets), (n_tok, sum(budgets))
        emit("mm_continuous_wall", wall, "s", requests=n_req,
             out_tokens=n_tok, compile_wall_s=round(compile_wall, 1),
             slots=slots, max_budget=max(budgets))
        emit("mm_continuous_throughput", n_tok / wall, "tok/s",
             requests=n_req, slots=slots, max_budget=max(budgets))


if __name__ == "__main__":
    main()
