"""1M-case retrieval through the user-facing database CLI, end to end.

The 0.706 ms @ 1M scan (BENCH/exp_retrieval_scale.py) measured the raw
jitted kernel over device-resident data.  This drives the command a
user actually runs — ``python -m emr2a_tpu.retrieval.database`` — over
a 1M-case matrix-form embeddings npz (the CV runner's
combined_embeddings.npz layout, matching the reference's
analysis/run_cv_experiments.py:300-311 cache) and times every phase:

  build: npz read -> normalize -> int8 quantize -> device upload -> save
  query: db npz read -> device upload -> search (compile + steady state)

Replaces the reference's per-query numpy scan
(/root/reference/utils/cv_evaluator.py:107-130) at a scale the
reference never reaches, via the CLI a user would actually run.

Usage (real chip):  python scripts/exp_db_cli_1m.py --n 1000000 \
    --dim 96 --dtype int8 --json_out BENCH_db_cli_1m.json
CPU smoke:          --n 2000 --cpu
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_cli(args_list, cpu=False):
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "emr2a_tpu.retrieval.database"]
        + args_list + (["--cpu"] if cpu else []),
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    wall = time.time() - t0
    out = proc.stdout + proc.stderr
    if proc.returncode != 0:
        print(out[-4000:], flush=True)
        raise SystemExit(f"CLI failed: {args_list[0]}")
    return wall, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=96,
                    help="embedding dim (96 = the protocol's PCA dim, "
                         "analysis CLI default)")
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--dtype", default="int8",
                    choices=["f32", "bf16", "int8"])
    ap.add_argument("--repeat", type=int, default=30)
    ap.add_argument("--workdir", default="/tmp/db_cli_1m")
    ap.add_argument("--json_out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)

    rng = np.random.RandomState(0)
    print(f"writing {args.n} x {args.dim} f32 embeddings npz ...",
          flush=True)
    t0 = time.time()
    emb = rng.randn(args.n, args.dim).astype(np.float32)
    ids = np.asarray([f"p{i:07d}" for i in range(args.n)])
    np.savez(work / "emb.npz", patient_ids=ids, image_matrix=emb)
    qn = args.queries
    np.savez(work / "queries.npz", patient_ids=ids[:qn],
             image_matrix=emb[:qn] + rng.randn(qn, args.dim).astype(
                 np.float32) * 0.01)
    t_gen = time.time() - t0
    print(f"dataset written in {t_gen:.1f} s "
          f"({(work / 'emb.npz').stat().st_size / 2**20:.0f} MB)",
          flush=True)

    build_wall, build_out = run_cli(
        ["build", "--embeddings_path", str(work / "emb.npz"),
         "--db", str(work / "db.npz"), "--dtype", args.dtype], cpu=args.cpu)
    m = re.search(r"load ([0-9.]+)s, \S+ ingest\+device ([0-9.]+)s, "
                  r"save ([0-9.]+)s", build_out)
    print(f"build: {build_wall:.1f} s total "
          f"(phases: {m.group(0) if m else 'n/a'})", flush=True)

    query_wall, query_out = run_cli(
        ["query", "--db", str(work / "db.npz"),
         "--queries_path", str(work / "queries.npz"),
         "--k", str(args.k), "--dtype", args.dtype,
         "--repeat", str(args.repeat),
         "--output", str(work / "hits.jsonl")], cpu=args.cpu)
    mload = re.search(r"Loaded database: .* in ([0-9.]+) s", query_out)
    msteady = re.search(
        r"min ([0-9.]+) ms, median ([0-9.]+) ms", query_out)
    print(f"query: {query_wall:.1f} s total; db load "
          f"{mload.group(1) if mload else '?'} s; steady-state "
          f"{msteady.group(0) if msteady else 'n/a'}", flush=True)

    # chained single-query device p50 through the same CLI command —
    # the BASELINE "<1 ms p50" protocol made user-reachable
    chain_wall, chain_out = run_cli(
        ["query", "--db", str(work / "db.npz"),
         "--queries_path", str(work / "queries.npz"),
         "--k", str(args.k), "--dtype", args.dtype,
         "--repeat", "100", "--chained"], cpu=args.cpu)
    mchain = re.search(r"Chained single-query scan: ([0-9.]+) ms/query",
                       chain_out)
    print(f"chained p50: "
          f"{mchain.group(1) if mchain else 'n/a'} ms/query "
          f"(wall {chain_wall:.1f} s)", flush=True)

    n_hits = len((work / "hits.jsonl").read_text().splitlines())
    assert n_hits == qn, (n_hits, qn)
    # sanity: each query's top hit should be its own perturbed source
    first = json.loads((work / "hits.jsonl").read_text().splitlines()[0])
    top_id = first["hits"][0]["patient_id"]
    print(f"sanity: query {first['query_id']} top hit {top_id} "
          f"(self-match expected)", flush=True)

    rows = [
        {"metric": "db_cli_build_wall", "value": round(build_wall, 1),
         "unit": "s"},
        {"metric": "db_cli_query_wall", "value": round(query_wall, 1),
         "unit": "s"},
    ]
    if m:
        rows += [
            {"metric": "db_cli_build_load", "value": float(m.group(1)),
             "unit": "s"},
            {"metric": "db_cli_build_ingest_device",
             "value": float(m.group(2)), "unit": "s"},
            {"metric": "db_cli_build_save", "value": float(m.group(3)),
             "unit": "s"},
        ]
    if mload:
        rows.append({"metric": "db_cli_query_db_load",
                     "value": float(mload.group(1)), "unit": "s"})
    if msteady:
        rows += [
            {"metric": "db_cli_search_min", "value": float(msteady.group(1)),
             "unit": "ms"},
            {"metric": "db_cli_search_median",
             "value": float(msteady.group(2)), "unit": "ms"},
        ]
    if mchain:
        rows.append({"metric": "db_cli_chained_p50",
                     "value": float(mchain.group(1)), "unit": "ms/query"})
    for rec in rows:
        rec.update(n=args.n, dim=args.dim, dtype=args.dtype,
                   queries=qn, k=args.k)
        print(json.dumps(rec), flush=True)
        if args.json_out:
            with open(args.json_out, "a", encoding="utf-8") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
