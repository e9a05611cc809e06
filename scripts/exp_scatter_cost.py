"""Attribute the continuous decode-step tax: per-row KV scatter vs DUS.

Continuous decode at 8B costs ~16 ms/step vs 13.3 static.  The only
structural difference per step is the KV write: slots sit at different
depths, so `cache_write` takes a (B,) offset vector and lowers to a
scatter per buffer (36 layers x 4 int8-mode buffers = 144 small
scatters/step) where the static path lowers one dynamic_update_slice
per buffer.  This isolates that term: chain `iters` steps of ONE
8B-shaped cache update loop — (a) scalar offset (DUS lowering),
(b) (B,) offsets (scatter lowering) — and report ms/step for each.
The delta x 1 step is the attributable tax; if it matches the
observed ~2.7 ms, the stacked-(layers, B, L) single-scatter redesign
(PERF_NOTES round-4 "known next optimization") is worth its refactor.

Usage: python scripts/exp_scatter_cost.py [--cpu] [--iters 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=36)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max_len", type=int, default=2048)
    ap.add_argument("--kv_heads", type=int, default=8)
    ap.add_argument("--head_dim", type=int, default=128)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--json_out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from emr2a_tpu.models.qwen3_vl import cache_write

    B, L, KV, HD = args.batch, args.max_len, args.kv_heads, args.head_dim
    n_layers = args.layers

    def make_cache(key):
        ks = jax.random.split(key, n_layers)
        return [
            (jax.random.randint(jax.random.fold_in(k, 0), (B, L, KV, HD),
                                -127, 128, jnp.int8),
             jax.random.normal(jax.random.fold_in(k, 1), (B, L, KV),
                               jnp.float32),
             jax.random.randint(jax.random.fold_in(k, 2), (B, L, KV, HD),
                                -127, 128, jnp.int8),
             jax.random.normal(jax.random.fold_in(k, 3), (B, L, KV),
                               jnp.float32))
            for k in ks]

    cache = jax.jit(make_cache)(jax.random.PRNGKey(0))
    jax.block_until_ready(cache)

    def chain(vector_offsets: bool):
        def step(carry, i):
            cache, pos = carry
            fresh_q = (i % 127 - 63).astype(jnp.int8) * jnp.ones(
                (B, 1, KV, HD), jnp.int8)
            fresh_s = jnp.full((B, 1, KV), 1.0, jnp.float32) * (
                1.0 + i.astype(jnp.float32) * 1e-9)
            off = pos if vector_offsets else pos[0]
            new = [
                (cache_write(kq, fresh_q, off),
                 cache_write(ks_, fresh_s, off),
                 cache_write(vq, fresh_q, off),
                 cache_write(vs, fresh_s, off))
                for kq, ks_, vq, vs in cache]
            return (new, pos + 1), ()

        @jax.jit
        def run(cache, pos0):
            (cache, _), _ = jax.lax.scan(
                step, (cache, pos0), jnp.arange(args.iters))
            # one scalar readback keyed on the data
            return cache[0][0].astype(jnp.int32).sum()

        return run

    records = []
    for name, vec in (("dus_scalar_offset", False),
                      ("scatter_row_offsets", True)):
        run = chain(vec)
        # staggered per-row depths for the scatter variant
        pos0 = jnp.full((B,), 64, jnp.int32) + (
            jnp.arange(B, dtype=jnp.int32) if vec else 0)
        float(run(cache, pos0))  # compile
        t0 = time.time()
        float(run(cache, pos0 + 1))
        dt = time.time() - t0
        ms = dt / args.iters * 1e3
        rec = {"metric": f"kv_write_{name}", "value": round(ms, 4),
               "unit": "ms/step", "layers": n_layers, "batch": B,
               "max_len": L, "iters": args.iters}
        records.append(rec)
        print(json.dumps(rec), flush=True)
        if args.json_out:
            with open(args.json_out, "a", encoding="utf-8") as f:
                f.write(json.dumps(rec) + "\n")
    if len(records) == 2:
        delta = records[1]["value"] - records[0]["value"]
        print(f"scatter tax: {delta:+.3f} ms/step "
              f"({n_layers * 4} buffers/step)", flush=True)


if __name__ == "__main__":
    main()
