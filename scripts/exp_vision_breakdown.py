"""Attribute the Qwen3-VL vision-tower forward cost at B=8 (round 5).

After the scan attention lowering, the B=8 frame-batched forward
measures ~49 ms (163.8 slices/s, BENCH_zoo_r5.json) but op-level
accounting covers only ~20 ms: matmuls 5.8 TF ~= 11.5 ms at the
500 TF/s envelope + scan attention 27 x 0.323 ~= 8.7 ms.  This
experiment times the pieces on-chip to find the other ~29 ms:

- ``tower_d1`` / ``tower_d27``: the real QwenVisionTower at depth 1 /
  27 -> per-block cost = (t27 - t1) / 26, and the fixed overhead
  (patch embed + pos interp + merger + taps) = t1 - per_block.
- ``prep``: the zoo's preprocess + patchify + temporal-concat chain.
- ``matmuls``: the block's projection chain alone at (F*S, D) —
  3 x qkv Dense + o Dense + fc1 + act + fc2 (no LN/rope/attention).
- ``matmuls_fused_qkv``: same with q/k/v as ONE (D, 3D) matmul — the
  apply-time weight-concat fusion candidate (activations are read
  once instead of three times; each projection is
  memory-bound at these shapes: 14.5 MB in + 14.5 MB out + 2.65 MB w
  vs 16.6 GF).
- ``ln_rope``: the block's elementwise frame (2 x LayerNorm + rope
  application) alone.

Methodology per CLAUDE.md: chain inside one jit, perturb inputs,
single scalar readback, subtract empty-program RTT, best of 3.

Measured result (BENCH_vision_breakdown.json, PERF_NOTES): per-block
1.763 ms x 27 + 1.25 fixed + 0.78 prep ~= the 48.9 ms forward; the
matmul chain alone is 0.94 ms/block (output-bytes bound) and fused
QKV measures the SAME (0.946) — the fusion hypothesis is refuted.
CAVEAT: the ln_rope probe reads 0.00 because the additive +i*1e-9
perturbation cancels inside LayerNorm centering, so XLA hoists the
whole probe out of the timing loop — do not trust that row; perturb
through a non-shift-invariant op when timing normalization chains.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

F, S, D, I, H = 8, 784, 1152, 4304, 16
HD = 72


def _t(f):
    t0 = time.time()
    f()
    return time.time() - t0


def _rtt():
    @jax.jit
    def empty(x):
        return x + 1.0

    float(empty(jnp.float32(0)))
    return min(_t(lambda: float(empty(jnp.float32(i)))) for i in range(1, 4))


def _chain(fn, x, iters):
    @jax.jit
    def run(x):
        def body(carry, i):
            o = fn(x + i * 1e-9)
            return carry + o.astype(jnp.float32).sum(), None

        total, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(iters, dtype=jnp.float32))
        return total

    t0 = time.time()
    float(run(x))
    compile_s = time.time() - t0
    dt = min(_t(lambda: float(run(x))) for _ in range(3))
    return compile_s, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="tower_d1,tower_d27,prep,matmuls,"
                    "matmuls_fused_qkv,ln_rope")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()

    from scripts.exp_qwen_generate import build_config
    from emr2a_tpu.models.qwen3_vl import QwenVisionTower
    from emr2a_tpu.ops.preprocess import CLIP_PREPROCESS, preprocess_images

    vcfg_full = build_config("8b").vision
    g = 448 // vcfg_full.patch_size
    grid = ((1, g, g),) * F
    pd = vcfg_full.temporal_patch_size * vcfg_full.patch_size ** 2 * 3

    rng = jax.random.PRNGKey(0)
    patches = jax.random.normal(rng, (F * S, pd), jnp.bfloat16)
    xact = jax.random.normal(rng, (F * S, D), jnp.bfloat16)

    rtt = _rtt()
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)
    results = {}

    def report(name, ms, compile_s, per_block=None):
        rec = {"metric": f"vision_breakdown_{name}", "value": round(ms, 3),
               "unit": "ms", "batch_frames": F}
        if per_block is not None:
            rec["per_block_ms"] = round(per_block, 4)
        results[name] = ms
        print(f"== {name}: {ms:.2f} ms (compile {compile_s:.0f}s)"
              + (f"  per-block {per_block:.3f} ms" if per_block else ""),
              flush=True)
        print(json.dumps(rec), flush=True)
        if args.json_out:
            with open(args.json_out, "a", encoding="utf-8") as f:
                f.write(json.dumps(rec) + "\n")

    parts = args.parts.split(",")

    for depth in (1, 27):
        name = f"tower_d{depth}"
        if name not in parts:
            continue
        vcfg = dataclasses.replace(vcfg_full, depth=depth,
                                   deepstack_visual_indexes=(0,))
        tower = QwenVisionTower(vcfg)
        params = jax.jit(
            lambda: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x,
                tower.init(jax.random.PRNGKey(0), patches, grid)["params"])
        )()
        taps = tuple(range(max(0, depth - 3), depth))

        def fwd(p, pt, _tower=tower, _taps=taps):
            out, _, tap_outs = _tower.apply({"params": p}, pt, grid,
                                            tap_layers=_taps)
            return out.astype(jnp.float32).sum() + sum(
                t.astype(jnp.float32).sum() for t in tap_outs)

        # close over params (300 MB at d27 would 413 the relay as a
        # constant — pass as arg)
        @jax.jit
        def run(p, pt):
            def body(carry, i):
                return carry + fwd(p, pt + i * 1e-9), None

            total, _ = jax.lax.scan(body, jnp.float32(0),
                                    jnp.arange(args.iters,
                                               dtype=jnp.float32))
            return total

        t0 = time.time()
        float(run(params, patches))
        compile_s = time.time() - t0
        dt = min(_t(lambda: float(run(params, patches))) for _ in range(3))
        ms = max(dt - rtt, 1e-9) / args.iters * 1e3
        report(name, ms, compile_s)

    if "tower_d1" in results and "tower_d27" in results:
        pb = (results["tower_d27"] - results["tower_d1"]) / 26
        fixed = results["tower_d1"] - pb
        print(f"** per-block {pb:.3f} ms x 27 = {pb*27:.1f} ms; "
              f"fixed (embed+pos+merger+taps) {fixed:.2f} ms", flush=True)

    if "prep" in parts:
        imgs = jax.jit(lambda k: (jax.random.uniform(k, (F, 448, 448, 3))
                                  * 255).astype(jnp.uint8))(rng)
        spec = dataclasses.replace(CLIP_PREPROCESS, resize_size=448,
                                   crop_size=448)

        def prep(u8f):
            x = preprocess_images(u8f.astype(jnp.uint8), spec)
            x = x.astype(jnp.bfloat16)
            B = x.shape[0]
            x = x.reshape(B, g, 16, g, 16, 3)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, -1)
            return jnp.concatenate([x, x], axis=-1)

        compile_s, dt = _chain(lambda u8: prep(u8), imgs.astype(jnp.float32),
                               args.iters)
        report("prep", max(dt - rtt, 1e-9) / args.iters * 1e3, compile_s)

    if "matmuls" in parts or "matmuls_fused_qkv" in parts:
        kq, kk, kv, ko, k1, k2 = jax.random.split(rng, 6)
        wq = jax.random.normal(kq, (D, D), jnp.bfloat16) * 0.02
        wk = jax.random.normal(kk, (D, D), jnp.bfloat16) * 0.02
        wv = jax.random.normal(kv, (D, D), jnp.bfloat16) * 0.02
        wo = jax.random.normal(ko, (D, D), jnp.bfloat16) * 0.02
        w1 = jax.random.normal(k1, (D, I), jnp.bfloat16) * 0.02
        w2 = jax.random.normal(k2, (I, D), jnp.bfloat16) * 0.02
        wqkv = jnp.concatenate([wq, wk, wv], axis=1)

        def chain_sep(x):
            q, k, v = x @ wq, x @ wk, x @ wv
            a = q + k + v  # stand-in for attention output (elementwise)
            y = a @ wo
            return x + jax.nn.gelu(y @ w1) @ w2

        def chain_fused(x):
            qkv = x @ wqkv
            q, k, v = jnp.split(qkv, 3, axis=-1)
            a = q + k + v
            y = a @ wo
            return x + jax.nn.gelu(y @ w1) @ w2

        if "matmuls" in parts:
            compile_s, dt = _chain(chain_sep, xact, args.iters)
            report("matmuls", max(dt - rtt, 1e-9) / args.iters * 1e3,
                   compile_s)
        if "matmuls_fused_qkv" in parts:
            compile_s, dt = _chain(chain_fused, xact, args.iters)
            report("matmuls_fused_qkv",
                   max(dt - rtt, 1e-9) / args.iters * 1e3, compile_s)

    if "ln_rope" in parts:
        from emr2a_tpu.models.qwen3_vl import apply_rope, vision_rope_cos_sin
        cos_np, sin_np = vision_rope_cos_sin(grid, HD, 2)
        cos = jnp.asarray(cos_np)[:S]
        sin = jnp.asarray(sin_np)[:S]
        x3 = xact.reshape(F, S, D)

        def ln_rope(x):
            m = x.mean(-1, keepdims=True)
            v = ((x - m) ** 2).mean(-1, keepdims=True)
            h = (x - m) * jax.lax.rsqrt(v + 1e-6)
            q = h.reshape(F, S, H, HD)
            qr, kr = apply_rope(q, q, cos[:, None, :], sin[:, None, :])
            m2 = x.mean(-1, keepdims=True)  # second LN stand-in
            return qr + kr + (x - m2).reshape(F, S, H, HD)

        compile_s, dt = _chain(ln_rope, x3, args.iters)
        report("ln_rope", max(dt - rtt, 1e-9) / args.iters * 1e3, compile_s)


if __name__ == "__main__":
    main()
