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
    included — the roots are what XLA actually schedules).

    The opcode is the first lowercase-starting token followed by '('
    after the '=': type tokens (f32[8,8]{1,0:T(8,128)S(1)}) contain no
    such pattern — layout annotations are uppercase (T/S) and dtypes
    are followed by '[' — verified against real axon-relay HLO."""
    counts = collections.Counter()
    for line in hlo_text.splitlines():
        if "=" not in line or "->" in line:
            continue
        m = re.search(r"=\s.*?([a-z][\w\-]*)\(", line)
        if m:
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
    from scripts.exp_qwen_generate import (_t, build_config,
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
            "step0": jnp.zeros((), jnp.int32),
        }
        jax.block_until_ready(state)
        return state

    active = jnp.ones((B,), bool)
    records = []

    # Through the axon relay jax.block_until_ready returns before the
    # computation finishes (measured: a 128-step 8B one-call program
    # "completed" in 2.4 ms); the only reliable fence is a host
    # readback.  All timings below therefore end with a scalar
    # np.asarray readback and subtract the measured empty-program RTT.
    def flush(x):
        return float(np.asarray(jax.tree_util.tree_leaves(x)[-1]).ravel()[0])

    @jax.jit
    def _empty(x):
        return x + 1.0

    float(_empty(jnp.float32(0)))
    rtt = min(_t(lambda: float(_empty(jnp.float32(i)))) for i in (1, 2, 3))
    print(f"relay rtt: {rtt*1e3:.1f} ms", flush=True)

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
    flush(toks)
    compile_static = time.time() - t0
    st2 = {k: v for k, v in out_state.items()}
    t0 = time.time()
    out_state, toks = static_fn(params, st2)
    flush(toks)
    emit("decode_static_scan",
         (time.time() - t0 - rtt) / args.steps * 1e3,
         {"compile_s": round(compile_static, 1)})

    # -- 1b. the batcher's REAL chunk program, one call for all steps,
    # in BOTH decode-KV layouts: per-row write offsets (the round-4
    # layout that lowered 144 scatters/step) and the uniform ring
    # (scalar offset -> dynamic-update-slice; the round-5 fix).
    for ring, name in ((False, "decode_chunk_one_call"),
                       (True, "decode_chunk_one_call_ring")):
        big = ContinuousBatcher(model, params, n_slots=B, prompt_bucket=P,
                                max_new_tokens=args.max_new,
                                eos_token_id=-1, kv_dtype=args.kv,
                                chunk=args.steps, ring_decode=ring)
        assert big.max_len >= M
        big.max_len = M  # pin identical cache shapes across variants
        chunk_big = big._build_chunk(sampling=False)
        st = fresh_state(1)
        t0 = time.time()
        out_state, toks = chunk_big(params, st, active)
        flush(toks)
        compile_big = time.time() - t0
        t0 = time.time()
        out_state, toks = chunk_big(params, dict(out_state), active)
        flush(toks)
        emit(name, (time.time() - t0 - rtt) / args.steps * 1e3,
             {"compile_s": round(compile_big, 1)})

    # -- 1c. hypothesis probe: the chunk program with a UNIFORM write
    # index (scalar cache_pos -> dynamic-update-slice lowering instead
    # of per-row scatter).  Numerically wrong (rows would overwrite a
    # shared slot) but structurally identical otherwise — isolates the
    # scatter lowering's share of the program tax.  If this lands near
    # the static scan, a ring layout (uniform physical write slot +
    # mask-side validity) recovers the gap exactly.
    def build_uniform(n_steps):
        def run(params, state, act_in):
            tl, pos_base = state["tl"], state["pos_base"]
            k_idx = jnp.arange(M)[None, None, :]

            def step(carry, i):
                cache, cur, gen, act = carry
                pos = jnp.broadcast_to(
                    (pos_base + gen)[None, :, None], (3, B, 1))
                mask = jnp.where(
                    (k_idx < tl[:, None, None])
                    | ((k_idx >= P) & (k_idx <= (P + gen)[:, None, None])),
                    0.0, -jnp.inf).astype(jnp.float32)
                logits, cache = model.apply(
                    {"params": params}, cur[:, None], pos,
                    cache=cache, cache_pos=P + i,   # scalar: the probe
                    attn_mask=mask)
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                act = act & (cur != eos)
                nxt = jnp.where(act, nxt, eos)
                gen = jnp.where(act, gen + 1, gen)
                return (cache, nxt, gen, act), cur

            (cache, cur, gen, _), toks = jax.lax.scan(
                step, (state["cache"], state["cur"], state["gen"], act_in),
                jnp.arange(n_steps))
            return dict(state, cache=cache, cur=cur, gen=gen), \
                toks.swapaxes(0, 1)

        return jax.jit(run, donate_argnums=(1,))

    uni_fn = build_uniform(args.steps)
    st = fresh_state(4)
    t0 = time.time()
    out_state, toks = uni_fn(params, st, active)
    flush(toks)
    compile_uni = time.time() - t0
    t0 = time.time()
    out_state, toks = uni_fn(params, dict(out_state), active)
    flush(toks)
    emit("decode_chunk_uniform_write",
         (time.time() - t0 - rtt) / args.steps * 1e3,
         {"compile_s": round(compile_uni, 1)})

    # -- 2. chained chunk calls, outputs held unread (pure dispatch tax)
    chunk_fn = srv._build_chunk(sampling=False)
    n_calls = max(1, args.steps // args.chunk)
    st = fresh_state(2)
    out_state, toks = chunk_fn(params, st, active)   # compile
    flush(toks)
    held = []
    t0 = time.time()
    for _ in range(n_calls):
        out_state, toks = chunk_fn(params, out_state, active)
        held.append(toks)
    flush(toks)
    emit("decode_chunk_chained_noread",
         (time.time() - t0 - rtt) / (n_calls * args.chunk) * 1e3,
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
    ring_tax = (by["decode_chunk_one_call_ring"]
                - by["decode_static_scan"])
    dispatch_tax = (by["decode_chunk_chained_noread"]
                    - by["decode_chunk_one_call_ring"]) * args.chunk
    readback_tax = (by["decode_chunk_chained_readback"]
                    - by["decode_chunk_chained_noread"]) * args.chunk
    summary = {
        "metric": "decode_tax_attribution",
        "program_tax_perrow_ms_per_step": round(program_tax, 4),
        "program_tax_ring_ms_per_step": round(ring_tax, 4),
        "ring_recovery_ms_per_step": round(program_tax - ring_tax, 4),
        "dispatch_tax_ms_per_chunk": round(dispatch_tax, 3),
        "readback_tax_ms_per_chunk": round(readback_tax, 3),
        "chunk": args.chunk,
        "note": "continuous step cost = static + program_tax + "
                "(dispatch+readback)/chunk; lookahead hides readback; "
                "ring (the serving default) replaces per-row",
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
