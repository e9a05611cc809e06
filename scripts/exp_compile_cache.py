"""Does JAX's persistent compilation cache survive the axon relay?

The cold-start wall is the dominant real-ops cost of a fresh serving
process: ~10 min of compiles for the full continuous-serving program
set, repaid by EVERY process because the remote XLA compile cache does
not persist (CLAUDE.md env notes; PERF_NOTES step4 section — the cold
wave is ~85% compiles).  JAX's client-side persistent cache
(``jax_compilation_cache_dir``) serializes compiled executables keyed
by HLO fingerprint; whether that works here depends on the relay's
PJRT backend supporting executable serialization/deserialization.

Protocol: the SAME program (an 8B-geometry few-layer decode chunk —
representative of the serving set) is compiled in two FRESH
subprocesses with the cache dir set.  Process 1 = cold (populates the
cache); process 2 = warm (hits it if supported).  A third control
process runs with NO cache dir.  Reports the three first-call walls;
warm << cold means the cache works and the serving CLIs should set it.

Usage: python scripts/exp_compile_cache.py [--cpu] [--layers 4]
           [--json_out BENCH_compile_cache.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(args):
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from emr2a_tpu.models.qwen3_vl import Qwen3VLModel, empty_kv_cache
    from emr2a_tpu.models.serving import ContinuousBatcher
    from scripts.exp_qwen_generate import (build_config,
                                           materialize_quantized_on_device)

    cfg = build_config("tiny" if args.cpu else "8b", layers=args.layers)
    model = Qwen3VLModel(cfg)
    params = materialize_quantized_on_device(model, jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    B, P = 8, 1024 if not args.cpu else 32
    srv = ContinuousBatcher(model, params, n_slots=B, prompt_bucket=P,
                            max_new_tokens=128, eos_token_id=-1,
                            kv_dtype="int8", chunk=16)
    state = srv._init_state()
    chunk_fn = srv._build_chunk(sampling=False)
    active = jnp.ones((B,), bool)
    t0 = time.time()
    new_state, toks = chunk_fn(params, state, active)
    jax.block_until_ready(toks)
    first = time.time() - t0
    t0 = time.time()
    new_state, toks = chunk_fn(params, dict(new_state), active)
    jax.block_until_ready(toks)
    steady = time.time() - t0
    print(json.dumps({"first_call_s": round(first, 2),
                      "steady_s": round(steady, 3)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--layers", type=int, default=4,
                    help="decoder layers (4 keeps the compile ~1 min "
                         "at 8B widths; the ratio is what matters)")
    ap.add_argument("--json_out", default=None)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cache_dir", default=None)
    args = ap.parse_args()
    if args.child:
        child(args)
        return

    cache_dir = tempfile.mkdtemp(prefix="jaxcache_")
    runs = [("cold_with_cache", cache_dir), ("warm_with_cache", cache_dir),
            ("no_cache_control", None)]
    records = []
    for name, cd in runs:
        cmd = [sys.executable, os.path.abspath(__file__), "--child",
               "--layers", str(args.layers)]
        if args.cpu:
            cmd.append("--cpu")
        if cd:
            cmd += ["--cache_dir", cd]
        t0 = time.time()
        out = subprocess.run(cmd, capture_output=True, text=True,
                             cwd=REPO, timeout=3600)
        wall = time.time() - t0
        line = (out.stdout.strip().splitlines() or ["{}"])[-1]
        try:
            payload = json.loads(line)
        except json.JSONDecodeError:
            payload = {"error": out.stdout[-500:] + out.stderr[-1000:]}
        n_entries = len(os.listdir(cache_dir)) if cd else None
        rec = {"metric": f"compile_cache_{name}", **payload,
               "process_wall_s": round(wall, 1),
               "cache_entries": n_entries, "layers": args.layers}
        records.append(rec)
        print(json.dumps(rec), flush=True)
        if args.json_out:
            with open(args.json_out, "a", encoding="utf-8") as f:
                f.write(json.dumps(rec) + "\n")
    by = {r["metric"]: r.get("first_call_s") for r in records}
    cold, warm = by.get("compile_cache_cold_with_cache"), \
        by.get("compile_cache_warm_with_cache")
    if cold and warm:
        verdict = ("CACHE WORKS (set jax_compilation_cache_dir in serving "
                   "CLIs)" if warm < 0.5 * cold else
                   "cache ineffective through this backend")
        summary = {"metric": "compile_cache_verdict",
                   "cold_s": cold, "warm_s": warm, "verdict": verdict}
        print(json.dumps(summary), flush=True)
        if args.json_out:
            with open(args.json_out, "a", encoding="utf-8") as f:
                f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
