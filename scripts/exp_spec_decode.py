"""Speculative-decoding cycle cost at real judge geometry, real chip.

The flagship 8B judge (/root/reference/encoders/
qwen3_vl_8b_thinking_encoder.py:30-43) decodes weight-stream bound
(docs/PERF_NOTES.md): every emitted token pays the full ~8.2 GB W8A8
stream.  Greedy speculative decoding (models/speculative.py) pays it
once per *cycle* — a 2B draft proposes k tokens, the target verifies
all k+1 in one forward — and is lossless, so the only question is the
measured cycle economics.

Random-init weights make the draft/target argmax agreement ~0 (two
independent random nets), which is exactly the WORST case: every
cycle emits one token, so the while_loop runs max_new cycles and

    cycle_time = (t(max_new=96) - t(max_new=32)) / 64

is a direct measurement.  Tokens/s at a real acceptance rate a
(per-position draft/target top-1 agreement) is then the *model*

    tok/s(a) = (1 + a + a^2 + ... + a^k) / cycle_time

(labeled modeled in PERF_NOTES; the measured terms are cycle_time and
the plain-decode baseline).  Break-even acceptance is where that
crosses the plain 8B tok/s.

Memory: 8B W8A8 (~8.8 GiB) + 2B W8A8 (~2.2 GiB) + two KV caches fits
the 16 GiB v5e single-chip.
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

from scripts.exp_qwen_generate import (
    build_config,
    materialize_quantized_on_device,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec_k", type=int, default=4)
    ap.add_argument("--kv", default="bf16", choices=["bf16", "int8"])
    ap.add_argument("--target_layers", type=int, default=None)
    ap.add_argument("--draft_layers", type=int, default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny geometry for a CPU harness smoke")
    ap.add_argument("--prompt_len", type=int, default=980)
    ap.add_argument("--bucket", type=int, default=1024)
    ap.add_argument("--json_out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test the harness on the CPU platform "
                         "(use with --target_layers/--draft_layers 2)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    records = []

    def emit(metric, value, unit, **extra):
        rec = {"metric": metric, "value": round(float(value), 3),
               "unit": unit, "spec_k": args.spec_k, **extra}
        if args.kv != "bf16":
            rec["kv"] = args.kv
        records.append(rec)
        print(json.dumps(rec), flush=True)
        if args.json_out:
            with open(args.json_out, "a", encoding="utf-8") as f:
                f.write(json.dumps(rec) + "\n")

    from emr2a_tpu.models.qwen3_vl import Qwen3VLModel
    from emr2a_tpu.models.speculative import SpeculativeGenerator

    tcfg = build_config("tiny" if args.tiny else "8b", args.target_layers)
    dcfg = build_config("tiny" if args.tiny else "2b", args.draft_layers)

    print("materializing 8B target (W8A8) on device...", flush=True)
    tmodel = Qwen3VLModel(tcfg)
    tparams = materialize_quantized_on_device(tmodel, jax.random.PRNGKey(0))
    jax.block_until_ready(tparams)
    print("materializing 2B draft (W8A8) on device...", flush=True)
    dmodel = Qwen3VLModel(dcfg)
    dparams = materialize_quantized_on_device(dmodel, jax.random.PRNGKey(7))
    jax.block_until_ready(dparams)
    n_bytes = sum(x.size * x.dtype.itemsize
                  for m in (tparams, dparams)
                  for x in jax.tree_util.tree_leaves(m))
    print(f"both models resident: {n_bytes/2**30:.2f} GiB", flush=True)

    spec = SpeculativeGenerator(tmodel, tparams, dmodel, dparams,
                                spec_k=args.spec_k, eos_token_id=-1,
                                kv_dtype=args.kv)
    prompt = np.random.RandomState(0).randint(
        2, tcfg.text.vocab_size - 2, (1, args.prompt_len), np.int64)

    times = {}
    lo, hi = (8, 24) if args.tiny else (32, 96)
    for max_new in (lo, hi):
        t0 = time.time()
        spec.generate(prompt, max_new_tokens=max_new,
                      prompt_bucket=args.bucket)
        print(f"compile+run max_new={max_new}: {time.time()-t0:.1f}s",
              flush=True)
        best = None
        for _ in range(3):
            t0 = time.time()
            spec.generate(prompt, max_new_tokens=max_new,
                          prompt_bucket=args.bucket)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[max_new] = best
    # acceptance ~0 with independent random weights: one cycle per token
    cycle = (times[hi] - times[lo]) / (hi - lo)
    print(f"speculative cycle (k={args.spec_k} draft steps + 1 target "
          f"verify): {cycle*1000:.2f} ms")
    emit("spec_cycle", cycle * 1000, "ms")
    emit("spec_worst_case_decode", 1 / cycle, "tok/s")
    k = args.spec_k
    for a in (0.5, 0.6, 0.7, 0.8, 0.9):
        toks = sum(a ** j for j in range(k + 1))
        emit("spec_decode_modeled", toks / cycle, "tok/s",
             acceptance=a, modeled=True)
    emit("models_resident", n_bytes / 2**30, "GiB")


if __name__ == "__main__":
    main()
