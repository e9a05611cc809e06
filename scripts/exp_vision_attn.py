"""Vision-tower attention strategies at the frame-batched audit shape.

Round-5 finding (PERF_NOTES "Qwen3-VL vision-tap ENCODER mode"): the
frame-batched QwenVisionBlock attention at B=8 materializes
(8, 16, 784, 784) f32 logits = 315 MB/block, and the logits+probs HBM
round-trip (~0.94 GB/block) explains the measured 65.7 ms forward to
within 4%.  This experiment measures the attention op ALONE at that
shape under three lowering strategies:

- ``xla``:    the current einsum -> softmax -> einsum chain (f32 logits)
- ``scan``:   the same chain per frame under ``lax.map`` (one frame's
              39 MB logits at a time -> inside XLA's fusion window)
- ``flash``:  ``jax.experimental.pallas.ops.tpu.flash_attention`` with
              seq padded 784 -> 896 (segment-ids mask the pad; head_dim
              72 pads to 128 lanes inside Mosaic)

Shapes: F=8 frames, H=16 heads, S=784 (448^2 / 16^2 patches), hd=72 —
the 8B vision geometry.  Attention FLOPs 22.7 GF -> ~45 us at the
500 TF/s envelope; the XLA chain's HBM-bound prediction is ~2.5 ms.

Methodology per CLAUDE.md: chain N iterations inside one jit with a
+i*1e-9 input perturbation, single scalar readback, subtract measured
empty-program RTT, best of 3.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

F, H, S, HD = 8, 16, 784, 72  # F overridable via --frames


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


def attn_xla(q, k, v):
    logits = jnp.einsum("fqhd,fkhd->fhqk", q, k,
                        preferred_element_type=jnp.float32) * HD ** -0.5
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("fhqk,fkhd->fqhd", probs, v)


def attn_scan(q, k, v):
    def one(args):
        qf, kf, vf = args
        logits = jnp.einsum("qhd,khd->hqk", qf, kf,
                            preferred_element_type=jnp.float32) * HD ** -0.5
        probs = jax.nn.softmax(logits, axis=-1).astype(qf.dtype)
        return jnp.einsum("hqk,khd->qhd", probs, vf)

    return jax.lax.map(one, (q, k, v))


def attn_flash(q, k, v):
    # the SHIPPED helper (pads 784 -> 896, SegmentIds, block_k 128) —
    # this measurement doubles as its on-chip parity gate
    from emr2a_tpu.ops.vision_flash import frame_flash_attention
    return frame_flash_attention(q, k, v, HD ** -0.5)


def attn_flash512(q, k, v):
    # pad 784 -> 1024 so block_k=512 divides: 14% more kv work for
    # 4x fewer kv-block revisits
    from emr2a_tpu.ops.vision_flash import frame_flash_attention
    return frame_flash_attention(q, k, v, HD ** -0.5, pad_multiple=512)


VARIANTS = {"xla": attn_xla, "scan": attn_scan, "flash": attn_flash,
            "flash512": attn_flash512}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="xla,scan,flash")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()
    global F
    if args.frames:
        F = args.frames

    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (F, S, H, HD), jnp.bfloat16)
    k = jax.random.normal(kk, (F, S, H, HD), jnp.bfloat16)
    v = jax.random.normal(kv, (F, S, H, HD), jnp.bfloat16)

    rtt = _rtt()
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)

    # numeric cross-check on tiny iters first (device, f32 compare)
    ref = None
    for name in args.variants.split(","):
        fn = VARIANTS[name]
        out = np.asarray(jax.jit(fn)(q, k, v), dtype=np.float32)
        if ref is None:
            ref = out
        else:
            err = float(np.max(np.abs(out - ref)))
            print(f"  {name}: max|delta| vs xla = {err:.4f}", flush=True)

        @jax.jit
        def chain(q, k, v, _fn=fn):
            def body(carry, i):
                o = _fn(q + i * 1e-9, k, v)
                return carry + o.astype(jnp.float32).sum(), None

            total, _ = jax.lax.scan(
                body, jnp.float32(0),
                jnp.arange(args.iters, dtype=jnp.float32))
            return total

        t0 = time.time()
        float(chain(q, k, v))
        print(f"== {name}: compile+run {time.time()-t0:.1f}s", flush=True)
        dt = min(_t(lambda: float(chain(q, k, v))) for _ in range(3))
        ms = max(dt - rtt, 1e-9) / args.iters * 1e3
        rec = {"metric": f"vision_attn_{name}_f{F}", "value": round(ms, 3),
               "unit": "ms/op", "shape": f"F{F} H{H} S{S} hd{HD}"}
        print(json.dumps(rec), flush=True)
        if args.json_out:
            with open(args.json_out, "a", encoding="utf-8") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
