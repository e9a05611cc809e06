"""Retrieval latency at BASELINE scale, measured on the real chip.

Replaces the round-1 extrapolation (VERDICT weak #3): measures
- the XLA matmul+top_k path at 1M x 256 (whole-DB single chip),
- cosine_topk_pallas at several tile sizes (win-or-demote decision),
- the 125k x 256 per-shard scan (the v5e-8 per-chip shard of a 1M DB),
- the k*8-candidate global merge step,
and prints a table for docs/PERF_NOTES.md.

Methodology (CLAUDE.md): iterations chained inside one jit via
lax.scan, queries perturbed by +c*1e-9 so nothing hoists, one scalar
readback, empty-jit RTT subtracted.
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

RTT_CACHE = {}


def _t(f):
    t0 = time.time()
    f()
    return time.time() - t0


def _rtt():
    if "rtt" not in RTT_CACHE:
        @jax.jit
        def empty(x):
            return x + 1.0
        float(empty(jnp.float32(0)))
        RTT_CACHE["rtt"] = min(_t(lambda: float(empty(jnp.float32(i))))
                               for i in range(1, 4))
    return RTT_CACHE["rtt"]


def timed(make_step, q0, db, iters, tag):
    """make_step: (q, db, c) -> (k,) vals; chained over iters.  The db
    is a jit ARGUMENT — closing over a 512 MB device array would embed
    it as an HLO constant and blow the remote-compile request body."""

    @jax.jit
    def chain(q, db):
        def body(carry, c):
            vals = make_step(carry, db, c)
            # fold top-k values back into the carried query so each
            # iteration depends on the last (no hoisting)
            carry = carry + vals.mean() * 1e-9
            return carry, None
        out, _ = jax.lax.scan(body, q, jnp.arange(iters, dtype=jnp.float32))
        return out.sum()

    float(chain(q0, db))  # compile
    dt = min(_t(lambda: float(chain(q0, db))) for _ in range(3)) - _rtt()
    ms = dt * 1000 / iters
    print(f"{tag:56s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--what", default="all",
                    help="comma list: xla,pallas,shard,merge")
    args = ap.parse_args()
    what = set(args.what.split(","))
    it = args.iters

    rng = np.random.RandomState(0)
    dim, k = 256, 5

    def make_db(n):
        # generate ON DEVICE: pushing 512 MB through the axon relay
        # takes tens of minutes; a jitted normal + row-norm takes ms
        @jax.jit
        def gen(key):
            db = jax.random.normal(key, (n, dim), jnp.float32)
            db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
            return db.astype(jnp.bfloat16)
        db = gen(jax.random.PRNGKey(n))
        db.block_until_ready()
        print(f"db {n}x{dim} ready", flush=True)
        return db

    q1 = jnp.asarray(rng.randn(1, dim), jnp.float32)
    q1 = q1 / jnp.linalg.norm(q1)

    if {"xla", "pallas", "all"} & what:
        db1m = make_db(1_000_000)

    if {"xla", "all"} & what:
        def xla_step(q, db, c):
            scores = jnp.matmul(q + c * 1e-9, db.T,
                                preferred_element_type=jnp.float32)
            vals, _ = jax.lax.top_k(scores, k)
            return vals[0]
        timed(xla_step, q1, db1m, it, "XLA matmul+top_k 1M x 256 bf16, q=1")

        for qn in (8, 64):
            qq = jnp.asarray(rng.randn(qn, dim), jnp.float32)
            qq = qq / jnp.linalg.norm(qq, axis=1, keepdims=True)
            def xla_stepn(q, db, c):
                scores = jnp.matmul(q + c * 1e-9, db.T,
                                    preferred_element_type=jnp.float32)
                vals, _ = jax.lax.top_k(scores, k)
                return vals.mean(axis=0)
            timed(xla_stepn, qq, db1m, it,
                  f"XLA matmul+top_k 1M x 256 bf16, q={qn}")

    if {"pallas", "all"} & what:
        from emr2a_tpu.ops.topk import cosine_topk_pallas
        for tile in (2048, 4096, 8192):
            def pl_step(q, db, c, tile=tile):
                vals, _ = cosine_topk_pallas(q + c * 1e-9, db, k=k,
                                             tile=tile)
                return vals[0]
            timed(pl_step, q1, db1m, it,
                  f"pallas fused topk 1M, tile={tile}, q=1")

    if {"shard", "all"} & what:
        db125 = make_db(125_000)
        def shard_step(q, db, c):
            scores = jnp.matmul(q + c * 1e-9, db.T,
                                preferred_element_type=jnp.float32)
            vals, _ = jax.lax.top_k(scores, k)
            return vals[0]
        timed(shard_step, q1, db125, it,
              "per-shard scan 125k x 256 bf16 (v5e-8 shard), q=1")

        from emr2a_tpu.ops.topk import cosine_topk_pallas
        for tile in (4096, 8192):
            def pl_shard(q, db, c, tile=tile):
                vals, _ = cosine_topk_pallas(q + c * 1e-9, db, k=k,
                                             tile=tile)
                return vals[0]
            timed(pl_shard, q1, db125, it,
                  f"pallas fused topk 125k, tile={tile}")

    if {"merge", "all"} & what:
        # Global merge: 8 shards' (k,) candidates + global ids -> top-k.
        cand_v = jnp.asarray(rng.rand(1, 8 * k), jnp.float32)
        cand_i = jnp.asarray(rng.randint(0, 10 ** 6, (1, 8 * k)), jnp.int32)

        def merge_step(q, db, c):
            v, sel = jax.lax.top_k(db + q.mean() * 1e-9 + c * 0, k)
            ids = jnp.take_along_axis(cand_i, sel, axis=1)
            return v[0] + ids[0].astype(jnp.float32) * 1e-12
        timed(merge_step, q1, cand_v, it, "global merge of 8 x k candidates")


if __name__ == "__main__":
    main()
