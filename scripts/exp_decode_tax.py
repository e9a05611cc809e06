"""Attribute the continuous decode-step tax (round-5 follow-up to
exp_scatter_cost.py, which REFUTED the KV-scatter hypothesis).

Continuous serving at 8B was decomposed to ~16 ms/decode-step vs
13.3-13.6 ms for the static batched scan (PERF_NOTES "The continuous
decode-step tax").  The scatter measured free, so the tax must live in
one of exactly three places — this script isolates each with the REAL
programs (not proxies):

1. **Per-step program cost**: the batcher's actual chunk program
   (ContinuousBatcher._build_chunk, greedy variant) run as ONE call
   covering all N steps, vs a static-style scan (scalar step counter
   and shared cache offset — the Qwen3VLGenerator._decode_step
   structure) over the SAME cache shapes, batch and max_len.  Any gap
   here is per-row-depth algebra / fusion loss in the compiled step.
2. **Per-dispatch overhead**: the same chunk program called K times
   back-to-back (donated state threads through; token outputs held
   unread) — adds K dispatches through the axon relay but no host
   processing.  Gap vs (1) / K = the per-chunk dispatch cost.
3. **Per-chunk readback**: same, but np.asarray(toks) after every call
   before dispatching the next — the no-lookahead serve() loop.  Gap
   vs (2) = the readback RTT the main/tail-phase lookahead hides.

The observed tax = (1)'s gap x 1 + ((2)+(3) gaps) / chunk.  Whatever
(1) shows also gets an optimized-HLO census when the relay supports
fetching it (``--hlo``): op-kind histograms of both step programs,
diffed, so the responsible ops are NAMED rather than guessed.

Usage (real chip, ~3 big compiles):
  python scripts/exp_decode_tax.py --geometry 8b --kv int8 \
      --json_out BENCH_decode_tax.json
  python scripts/exp_decode_tax.py --geometry tiny --cpu   # smoke
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def op_histogram(hlo_text: str) -> dict:
    """Count optimized-HLO instructions by op kind (fusion bodies
    included — the roots are what XLA actually schedules)."""
    counts = collections.Counter()
    for m in re.finditer(r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*[\w\[\]{},/ ]+\s+"
                         r"([a-z][\w\-]*)\(", hlo_text, re.M):
        counts[m.group(1)] += 1
    return dict(counts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", default="8b", choices=["tiny", "2b", "8b"])
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--bucket", type=int, default=1024)
    ap.add_argument("--max_new", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--steps", type=int, default=128,
                    help="total decode steps per variant (one-call "
                         "variants run them in one program; chained "
                         "variants as steps/chunk calls)")
    ap.add_argument("--kv", default="int8", choices=["bf16", "int8"])
    ap.add_argument("--hlo", action="store_true",
                    help="fetch optimized HLO for the two step "
                         "programs and print an op-kind diff (may be "
                         "unsupported through the relay)")
    ap.add_argument("--json_out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from emr2a_tpu.models.qwen3_vl import Qwen3VLModel, empty_kv_cache
    from emr2a_tpu.models.serving import ContinuousBatcher
    from scripts.exp_qwen_generate import (build_config,
                                           materialize_quantized_on_device)

    cfg = build_config(args.geometry, layers=args.layers)
    model = Qwen3VLModel(cfg)
    params = materialize_quantized_on_device(model, jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    B, P = args.slots, args.bucket
    srv = ContinuousBatcher(model, params, n_slots=B, prompt_bucket=P,
                            max_new_tokens=args.max_new, eos_token_id=-1,
                            kv_dtype=args.kv, chunk=args.chunk)
    M = srv.max_len  # bucket + max_new + 2*chunk — shared by ALL variants

    def fresh_state(seed):
        # staggered per-row depths, mid-stream (the serving regime)
        gen = jnp.asarray((np.arange(B) * 13 + 5 + seed) % 96, jnp.int32)
        state = {
            "cache": empty_kv_cache(cfg.text, B, M, args.kv),
            "cur": jnp.full((B,), 7 + seed, jnp.int32),
            "gen": gen,
            "pos_base": jnp.full((B,), P - 44, jnp.int32),
            "tl": jnp.asarray(P - 44 - (np.arange(B) % 7), jnp.int32),
            "key": jax.random.split(jax.random.PRNGKey(seed), B),
            "temp": jnp.zeros((B,), jnp.float32),
            "top_p": jnp.ones((B,), jnp.float32),
        }
        jax.block_until_ready(state)
        return state

    active = jnp.ones((B,), bool)
    records = []

    def emit(metric, ms_per_step, extra=None):
        rec = {"metric": metric, "value": round(ms_per_step, 4),
               "unit": "ms/step", "geometry": args.geometry,
               "slots": B, "bucket": P, "max_len": M, "kv": args.kv,
               "steps": args.steps, "chunk": args.chunk}
        if extra:
            rec.update(extra)
        records.append(rec)
        print(json.dumps(rec), flush=True)

    # -- 1a. static-style scan: scalar step counter, shared cache
    # offset (the Qwen3VLGenerator._decode_step structure), same
    # shapes/max_len as the chunk program.
    eos = -1

    def build_static(n_steps):
        def run(params, state):
            tl, pos_base = state["tl"], state["pos_base"]
            k_idx = jnp.arange(M)[None, None, :]

            def step(carry, i):
                cache, cur, done = carry
                pos = jnp.broadcast_to(
                    (pos_base + i)[None, :, None], (3, B, 1))
                mask = jnp.where(
                    (k_idx < tl[:, None, None])
                    | ((k_idx >= P) & (k_idx <= P + i)),
                    0.0, -jnp.inf).astype(jnp.float32)
                logits, cache = model.apply(
                    {"params": params}, cur[:, None], pos,
                    cache=cache, cache_pos=P + i, attn_mask=mask)
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                done = done | (cur == eos)
                nxt = jnp.where(done, eos, nxt)
                return (cache, nxt, done), cur

            (cache, cur, _), toks = jax.lax.scan(
                step, (state["cache"], state["cur"],
                       jnp.zeros((B,), bool)),
                jnp.arange(n_steps))
            return dict(state, cache=cache, cur=cur), toks.swapaxes(0, 1)

        return jax.jit(run, donate_argnums=(1,))

    static_fn = build_static(args.steps)
    st = fresh_state(0)
    t0 = time.time()
    out_state, toks = static_fn(params, st)
    jax.block_until_ready(toks)
    compile_static = time.time() - t0
    st2 = {k: v for k, v in out_state.items()}
    t0 = time.time()
    out_state, toks = static_fn(params, st2)
    jax.block_until_ready((out_state, toks))
    emit("decode_static_scan", (time.time() - t0) / args.steps * 1e3,
         {"compile_s": round(compile_static, 1)})

    # -- 1b. the batcher's REAL chunk program, one call for all steps
    big = ContinuousBatcher(model, params, n_slots=B, prompt_bucket=P,
                            max_new_tokens=args.max_new, eos_token_id=-1,
                            kv_dtype=args.kv, chunk=args.steps)
    assert big.max_len >= M
    big.max_len = M  # pin identical cache shapes across variants
    chunk_big = big._build_chunk(sampling=False)
    st = fresh_state(1)
    t0 = time.time()
    out_state, toks = chunk_big(params, st, active)
    jax.block_until_ready(toks)
    compile_big = time.time() - t0
    t0 = time.time()
    out_state, toks = chunk_big(params, dict(out_state), active)
    jax.block_until_ready((out_state, toks))
    emit("decode_chunk_one_call", (time.time() - t0) / args.steps * 1e3,
         {"compile_s": round(compile_big, 1)})

    # -- 2. chained chunk calls, outputs held unread (pure dispatch tax)
    chunk_fn = srv._build_chunk(sampling=False)
    n_calls = max(1, args.steps // args.chunk)
    st = fresh_state(2)
    out_state, toks = chunk_fn(params, st, active)   # compile
    jax.block_until_ready(toks)
    held = []
    t0 = time.time()
    for _ in range(n_calls):
        out_state, toks = chunk_fn(params, out_state, active)
        held.append(toks)
    jax.block_until_ready((out_state, held))
    emit("decode_chunk_chained_noread",
         (time.time() - t0) / (n_calls * args.chunk) * 1e3,
         {"calls": n_calls})

    # -- 3. chained chunk calls with per-chunk token readback (the
    # no-lookahead serve loop)
    t0 = time.time()
    for _ in range(n_calls):
        out_state, toks = chunk_fn(params, out_state, active)
        np.asarray(toks)
    emit("decode_chunk_chained_readback",
         (time.time() - t0) / (n_calls * args.chunk) * 1e3,
         {"calls": n_calls})

    # -- derived attribution
    by = {r["metric"]: r["value"] for r in records}
    program_tax = by["decode_chunk_one_call"] - by["decode_static_scan"]
    dispatch_tax = (by["decode_chunk_chained_noread"]
                    - by["decode_chunk_one_call"]) * args.chunk
    readback_tax = (by["decode_chunk_chained_readback"]
                    - by["decode_chunk_chained_noread"]) * args.chunk
    summary = {
        "metric": "decode_tax_attribution",
        "program_tax_ms_per_step": round(program_tax, 4),
        "dispatch_tax_ms_per_chunk": round(dispatch_tax, 3),
        "readback_tax_ms_per_chunk": round(readback_tax, 3),
        "chunk": args.chunk,
        "note": "continuous step cost = static + program_tax + "
                "(dispatch+readback)/chunk; lookahead hides readback",
    }
    records.append(summary)
    print(json.dumps(summary), flush=True)

    # -- optional HLO census of both step programs
    if args.hlo:
        try:
            st_shapes = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                fresh_state(3))
            p_shapes = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
            texts = {}
            for name, fn, a in (
                    ("static", build_static(args.chunk),
                     (p_shapes, st_shapes)),
                    ("chunk", srv._build_chunk(False),
                     (p_shapes, st_shapes,
                      jax.ShapeDtypeStruct((B,), jnp.bool_)))):
                compiled = fn.lower(*a).compile()
                texts[name] = compiled.as_text()
                with open(f"/tmp/hlo_{name}.txt", "w") as f:
                    f.write(texts[name])
            h_s, h_c = (op_histogram(texts[k]) for k in ("static", "chunk"))
            diff = {op: h_c.get(op, 0) - h_s.get(op, 0)
                    for op in sorted(set(h_s) | set(h_c))
                    if h_c.get(op, 0) != h_s.get(op, 0)}
            rec = {"metric": "hlo_op_diff_chunk_minus_static",
                   "diff": diff, "files": "/tmp/hlo_{static,chunk}.txt"}
            records.append(rec)
            print(json.dumps(rec), flush=True)
        except Exception as e:  # relay may refuse as_text()
            print(json.dumps({"metric": "hlo_census",
                              "error": repr(e)}), flush=True)

    if args.json_out:
        with open(args.json_out, "w", encoding="utf-8") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
