"""Streaming-int8 tile sweep: why does linear_w8a8 run at ~bf16 rate?

The pure-MXU roofline (exp_roofline.py --what int8) shows s8 x s8 at
389-426 TOP/s, yet linear_w8a8 at encoder shapes (18464,1024)x
(1024,1024) measures ~200 TF/s-equivalent.  This sweep separates the
suspects on-chip:

  1. pure-MXU s8 rate AT THE STREAMING KERNEL'S TILE SHAPES
     (is the dot itself slow at (2048,1024)x(1024,512)?)
  2. linear_w8a8 end-to-end under different row/column tile picks
     (is it the DMA pipeline / grid order?)
  3. the same with f32 vs bf16 output (is it the output write?)

Every timing is a >=100-iteration lax.scan chain with one scalar
readback (relay RTT rules, docs/PERF_NOTES.md methodology).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.exp_roofline import mxu_rate, rtt, _t  # noqa: E402


def bench_linear(T, K, N, tile_n, row_cap, iters=100, out_dtype=jnp.bfloat16):
    """linear_w8a8 end-to-end (includes activation quantize) with a
    monkeypatched row-tile cap; reports ms/call and effective TF/s."""
    import emr2a_tpu.ops.linear_int8 as li

    orig = li._pick_tiles

    def capped(tp, K_, N_, tile_n_max, out_itemsize, in_itemsize):
        def vmem(tile_t, tile_n_):
            return (2 * (tile_t * K_ * in_itemsize + K_ * tile_n_
                         + tile_t * tile_n_ * out_itemsize)
                    + 5 * tile_t * K_ + 12 * tile_n_)
        tile_t = min(tp, row_cap)
        tn = min(-(-N_ // 128) * 128, tile_n_max)
        while vmem(tile_t, tn) > li._VMEM_BUDGET and tile_t > 256:
            tile_t //= 2
        while vmem(tile_t, tn) > li._VMEM_BUDGET and tn > 128:
            tn //= 2
        while vmem(tile_t, tn) > li._VMEM_BUDGET and tile_t > 32:
            tile_t //= 2
        return tile_t, tn

    li._pick_tiles = capped
    try:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(T, K) * 0.1, jnp.bfloat16)
        wq = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
        ws = jnp.asarray(np.abs(rng.randn(N)) * 0.01 + 1e-3, jnp.float32)

        @jax.jit
        def chain(x, wq, ws):
            def body(c, i):
                y = li.linear_w8a8(x + i * 1e-9, wq, ws, tile_n=tile_n,
                                   out_dtype=out_dtype)
                return c + y[0, 0].astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(iters, dtype=jnp.float32))
            return out

        float(chain(x, wq, ws))
        dt = (min(_t(lambda: float(chain(x, wq, ws))) for _ in range(3))
              - rtt()) / iters
        tf = 2 * T * K * N / dt / 1e12
        print(f"linear_w8a8 ({T},{K})x({K},{N}) tile_n={tile_n} "
              f"row_cap={row_cap} out={jnp.dtype(out_dtype).name}: "
              f"{dt*1e3:7.3f} ms  {tf:6.1f} TF/s-equiv", flush=True)
        return dt, tf
    finally:
        li._pick_tiles = orig


def bench_bf16_ref(T, K, N, iters=100):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(T, K) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.randn(K, N) * 0.1, jnp.bfloat16)

    @jax.jit
    def chain(x, w):
        def body(c, i):
            y = (x + i * 1e-9) @ w
            # consume the FULL output: y[0, 0] alone lets XLA shrink
            # the matmul to one row x one column (observed — absurd
            # "TF/s" in the first run of this probe)
            return c + jnp.sum(y.astype(jnp.float32)), None
        out, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(iters, dtype=jnp.float32))
        return out

    float(chain(x, w))
    dt = (min(_t(lambda: float(chain(x, w))) for _ in range(3))
          - rtt()) / iters
    tf = 2 * T * K * N / dt / 1e12
    print(f"bf16 XLA    ({T},{K})x({K},{N}): {dt*1e3:7.3f} ms  "
          f"{tf:6.1f} TF/s", flush=True)
    return dt, tf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="all")
    args = ap.parse_args()

    if args.what in ("mxu", "all"):
        print("== pure-MXU s8 at streaming-kernel tile shapes ==")
        for M, K, N in ((2048, 1024, 512), (1024, 1024, 512),
                        (512, 1024, 512), (256, 1024, 512),
                        (1024, 1024, 1024), (256, 768, 3072)):
            # total chain >= 0.5 s or the relay RTT dominates
            est = 2 * M * K * N / 400e12
            mxu_rate(M, K, N, steps=max(2000, int(0.5 / est)),
                     dtype=jnp.int8)

    if args.what in ("linear", "all"):
        print("== linear_w8a8 end-to-end at the encoder shape ==")
        T, K, N = 18464, 1024, 1024
        bench_bf16_ref(T, K, N)
        for row_cap in (512, 1024, 2048):
            for tile_n in (256, 512, 1024):
                bench_linear(T, K, N, tile_n, row_cap)
        # output-write cost: f32 doubles the out bytes
        bench_linear(T, K, N, 512, 2048, out_dtype=jnp.float32)


if __name__ == "__main__":
    main()
