"""Composed step4 audit pipeline at 8B geometry, on-chip: cases/hour.

Every step4 stage is individually proven (prefill/decode benches,
parser tests, metrics parity); this drives the COMPOSITION the user
actually runs — ``run_vlm_audit_pipeline`` (the exact function behind
``python -m emr2a_tpu.pipelines.step4_vlm_review.run``, same args the
CLI main() passes): fold-metrics loading, evidence packaging (real PNG
slices -> PIL -> Qwen image processor), prompt split (constant system
block = shared-prefix KV), continuous serving with batched refills,
parser waterfall over whatever greedy random-weight decode emits,
decision thresholds, AURC/AUROC metrics, artifact writes.  Matches
/root/reference/pipelines/step4_vlm_review/run.py:91.

Weights are random (no checkpoints in this environment; perf is
weight-agnostic) and injected via the runner's ``backend=`` parameter
— the only substitution vs the CLI, which would build the same backend
from --model_path.  Random weights never emit eos, so every case pays
its FULL --max_new budget: the cases/hour number is the worst case;
real audits stop at eos (short accepts) and go faster.

Axon-relay caveat: host->device image upload through the tunnel is
~0.3 MB/s (a real TPU VM moves PCIe ~GB/s); the script times one
case's patch upload separately and reports it so the serving-side
number is separable from the environment artifact.

Usage (real chip):
  python scripts/exp_step4_e2e.py --geometry 8b --cases 32 \
      --vlm_batch_size 8 --max_new 1024 --json_out BENCH_step4_e2e.json
CPU smoke: --geometry tiny --cases 3 --max_new 8 --cpu.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zlib
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from exp_qwen_generate import build_config, materialize_quantized_on_device

LABELS = ["PJP", "Bacterial", "Viral", "Normal"]


class Crc32Tokenizer:
    """Deterministic word-level tokenizer over the REAL Qwen special
    ids — lets the full chat/expand path run without a tokenizer
    checkpoint.  Vocabulary collisions are harmless (random weights)."""

    eos_token_id = 151645

    def __init__(self, specials, vocab_mod=150000):
        self.specials = specials
        self.vocab_mod = vocab_mod

    def __call__(self, text, add_special_tokens=False, return_tensors=None):
        for lit, tid in self.specials.items():
            text = text.replace(lit, f" \x00{tid} ")
        ids = []
        for tok in text.split():
            if tok.startswith("\x00"):
                ids.append(int(tok[1:]))
            else:
                ids.append(zlib.crc32(tok.encode()) % self.vocab_mod + 10)
        if return_tensors == "np":
            return {"input_ids": np.asarray([ids], dtype=np.int64)}
        return {"input_ids": ids}

    def decode(self, tokens, skip_special_tokens=True):
        return " ".join(f"t{t}" for t in tokens)


def build_cohort(root: Path, n_cases: int, side: int, rng) -> tuple:
    """Synthetic manifest + PNG slices + a fold metrics.json tree (the
    step4 input contract, utils/cv_evaluator.py fold artifacts)."""
    from PIL import Image
    from emr2a_tpu.data.manifest import save_manifest

    records = []
    for i in range(n_cases):
        pid = f"p{i:03d}"
        pdir = root / "imgs" / pid
        pdir.mkdir(parents=True, exist_ok=True)
        slices = []
        for s in range(5):
            img = (rng.rand(side, side, 3) * 255).astype(np.uint8)
            p = pdir / f"s{s}.png"
            Image.fromarray(img).save(p)
            slices.append(str(p))
        records.append({"patient_id": pid, "label": LABELS[i % 4],
                        "image_dir": str(pdir), "slices": slices,
                        "meta": {"sex": "M" if i % 2 else "F",
                                 "age": 40 + i, "fever": "yes",
                                 "symptom": "cough"}})
    manifest_path = root / "manifest.jsonl"
    save_manifest(records, manifest_path)

    exp_dir = root / "exp_e2e"
    fold = exp_dir / "fold_1"
    fold.mkdir(parents=True, exist_ok=True)
    pids = [r["patient_id"] for r in records]
    metrics = {
        "test_patient_ids": pids,
        "all_top_labels": [[LABELS[(i + j) % 4] for j in range(3)]
                           for i in range(n_cases)],
        "all_top_scores": [[0.9 - 0.1 * j for j in range(3)]
                           for _ in range(n_cases)],
        "all_top_patient_ids": [
            [pids[(i + 1 + j) % n_cases] for j in range(3)]
            for i in range(n_cases)],
    }
    (fold / "metrics.json").write_text(json.dumps(metrics))
    return manifest_path, exp_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", default="8b",
                    choices=["tiny", "2b", "8b"])
    ap.add_argument("--cases", type=int, default=32)
    ap.add_argument("--vlm_batch_size", type=int, default=8)
    ap.add_argument("--serving", default="continuous",
                    choices=["static", "continuous"])
    ap.add_argument("--max_new", type=int, default=1024)
    ap.add_argument("--image_side", type=int, default=448)
    ap.add_argument("--precision", default="int8",
                    choices=["bf16", "int8", "int4"])
    ap.add_argument("--kv", default="int8", choices=["bf16", "int8"])
    ap.add_argument("--prefill_chunk", type=int, default=None)
    ap.add_argument("--waves", type=int, default=1,
                    help="run the pipeline N times in one process; wave "
                         "2+ reuses every compiled program = the steady "
                         "state of a long-lived judge service")
    ap.add_argument("--prompt_bucket", type=int, default=256,
                    help="bucket granularity (generate_stream rounds "
                         "the wave's max prompt up to a multiple)")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--json_out", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--compile_cache", default=None, metavar="DIR",
                    help="persistent XLA compile cache dir; run twice "
                         "in fresh processes with the same DIR to "
                         "measure the cold-wall repayment")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.compile_cache:
        from emr2a_tpu.utils.compile_cache import enable_compile_cache
        enable_compile_cache(args.compile_cache)
    import jax.numpy as jnp

    from emr2a_tpu.models.qwen3_vl import Qwen3VLModel
    from emr2a_tpu.judge.qwen_backend import QwenVLBackend
    from emr2a_tpu.encoders.qwen3_vl_encoder import make_image_processor
    from emr2a_tpu.pipelines.step4_vlm_review.run import (
        run_vlm_audit_pipeline)

    cfg = build_config(args.geometry)
    side = args.image_side if args.geometry != "tiny" else 8
    if args.geometry == "tiny":
        import dataclasses
        cfg = dataclasses.replace(cfg, image_token_id=500,
                                  vision_start_token_id=498)
    model = Qwen3VLModel(cfg)
    vis = cfg.vision
    gh = side // vis.patch_size
    grid = (1, gh, gh)

    print(f"init {args.geometry} params on device ({args.precision} "
          "decoder + bf16 vision)...", flush=True)
    if args.geometry == "8b":
        params = materialize_quantized_on_device(
            model, jax.random.PRNGKey(0), lm_head_int8=False,
            precision=args.precision, vision_grid=grid)
        be_precision = "bf16"  # params already in quantized layout
    else:
        n_tok = gh * gh // vis.spatial_merge_size ** 2
        ids1 = jnp.concatenate([
            jnp.zeros((1, 2), jnp.int32),
            jnp.full((1, n_tok), cfg.image_token_id, jnp.int32),
            jnp.zeros((1, 2), jnp.int32)], axis=1)
        pos1 = jnp.zeros((3, 1, ids1.shape[1]), jnp.int32)
        patches1 = jnp.zeros((gh * gh, vis.patch_dim), vis.dtype)
        params = jax.jit(lambda k: jax.tree_util.tree_map(
            lambda x: (x.astype(jnp.bfloat16)
                       if x.dtype == jnp.float32 else x),
            model.init(k, ids1, pos1, pixel_patches=patches1,
                       grid_thw=(grid,))["params"]))(jax.random.PRNGKey(0))
        be_precision = args.precision
    jax.block_until_ready(params)

    tiny = args.geometry == "tiny"
    specials = {
        "<|image_pad|>": cfg.image_token_id,
        "<|vision_start|>": cfg.vision_start_token_id,
        "<|vision_end|>": cfg.vision_start_token_id + 1,
        "<|im_start|>": 490 if tiny else 151644,
        "<|im_end|>": 1 if tiny else 151645,
    }
    tok = Crc32Tokenizer(specials, vocab_mod=400 if tiny else 150000)
    if tiny:
        tok.eos_token_id = 1
    proc = make_image_processor(vis, min_pixels=vis.patch_size ** 2 * 4,
                                max_pixels=side * side)
    be = QwenVLBackend(None, config=cfg, params=params, tokenizer=tok,
                       image_processor=proc,
                       prompt_bucket=args.prompt_bucket,
                       precision=be_precision, kv_dtype=args.kv,
                       standardize_images=side,
                       prefill_chunk=args.prefill_chunk)

    workdir = Path(args.workdir or "/tmp/step4_e2e")
    rng = np.random.RandomState(0)
    print(f"building synthetic cohort: {args.cases} cases x 5 slices "
          f"@ {side}^2 ...", flush=True)
    manifest_path, exp_dir = build_cohort(workdir, args.cases, side, rng)

    # isolate the axon-relay patch-upload artifact: one case = 7 images
    from PIL import Image
    probe = proc(images=[np.asarray(
        Image.open(json.loads(manifest_path.read_text().splitlines()[0])
                   ["slices"][0]))] * 7, return_tensors="np")
    up0 = time.time()
    jax.block_until_ready(jnp.asarray(probe["pixel_values"]))
    upload_per_case = time.time() - up0
    print(f"relay patch upload: {upload_per_case:.2f} s/case "
          f"({probe['pixel_values'].nbytes/2**20:.1f} MB)", flush=True)

    rows = []
    for wave in range(args.waves):
        out_dir = workdir / f"out_w{wave}"
        print(f"running step4 pipeline (wave {wave + 1}/{args.waves}): "
              f"{args.cases} cases, serving={args.serving}, "
              f"slots={args.vlm_batch_size}, max_new={args.max_new} ...",
              flush=True)
        t0 = time.time()
        results = run_vlm_audit_pipeline(
            exp_dir=exp_dir, manifest_path=str(manifest_path),
            output_dir=str(out_dir), max_samples=args.cases,
            backend=be, serving=args.serving,
            vlm_batch_size=args.vlm_batch_size,
            vlm_max_new_tokens=args.max_new,
            prefill_chunk=args.prefill_chunk)
        wall = time.time() - t0

        summary = out_dir / "vlm_audit_summary.json"
        details = out_dir / "vlm_audit_details.jsonl"
        n_detail = (len(details.read_text().splitlines())
                    if details.exists() else 0)
        n = len(results.get("audit_results", [])) or args.cases
        tag = "" if wave == 0 else "_warm"
        print(f"wave {wave + 1} wall: {wall:.1f} s = {wall/n:.1f} s/case "
              f"= {3600*n/wall:.1f} cases/hour (artifacts: "
              f"summary={summary.exists()}, details={n_detail})",
              flush=True)
        rows += [
            {"metric": f"step4_wall_per_case{tag}",
             "value": round(wall / n, 2), "unit": "s"},
            {"metric": f"step4_cases_per_hour{tag}",
             "value": round(3600 * n / wall, 1), "unit": "cases/hour"},
        ]
    rows.append({"metric": "step4_relay_upload_per_case",
                 "value": round(upload_per_case, 2), "unit": "s"})
    for rec in rows:
        rec.update(geometry=args.geometry, precision=args.precision,
                   kv=args.kv, serving=args.serving,
                   slots=args.vlm_batch_size, cases=args.cases,
                   max_new=args.max_new, image_side=side)
        print(json.dumps(rec), flush=True)
        if args.json_out:
            with open(args.json_out, "a", encoding="utf-8") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
