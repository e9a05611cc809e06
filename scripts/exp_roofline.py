"""Roofline artifact for the 5k slices/s BioMedCLIP target (BASELINE).

Measures, on the real chip, the PURE MXU rate at the tower's exact
matmul shapes — a Pallas kernel whose operands live in VMEM across all
grid steps, so there is no HBM traffic, no LN/softmax/gelu, no
pipeline stalls: an upper bound no real kernel can beat — plus the
HBM stream rate.  Then computes the minimum achievable forward time
for the ViT-B/16 tower from those ceilings and compares with the
target.  See docs/PERF_NOTES.md "Roofline" for the recorded result.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _t(f):
    t0 = time.time()
    f()
    return time.time() - t0


RTT = {}


def rtt():
    if not RTT:
        @jax.jit
        def empty(x):
            return x + 1.0
        float(empty(jnp.float32(0)))
        RTT["v"] = min(_t(lambda: float(empty(jnp.float32(i))))
                       for i in range(1, 4))
    return RTT["v"]


def _mm_kernel(x_ref, w_ref, o_ref, *, steps):
    # One matmul per grid step on VMEM-resident operands; the result is
    # written each step (same buffer) so nothing is elided.
    acc = (jnp.int32 if x_ref.dtype == jnp.int8 else jnp.float32)
    o_ref[:, :] = jax.lax.dot_general(
        x_ref[:, :], w_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc).astype(o_ref.dtype)


def mxu_rate(M, K, N, steps=2000, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.randint(-100, 100, (M, K)), jnp.int8)
        w = jnp.asarray(rng.randint(-100, 100, (K, N)), jnp.int8)
    else:
        x = jnp.asarray(rng.randn(M, K) * 0.1, dtype)
        w = jnp.asarray(rng.randn(K, N) * 0.1, dtype)
    vm = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_mm_kernel, steps=steps),
        grid=(steps,),
        in_specs=[vm((M, K)), vm((K, N))],
        out_specs=vm((M, N)),
        out_shape=jax.ShapeDtypeStruct(
            (M, N), jnp.int32 if dtype == jnp.int8 else dtype),
    )

    @jax.jit
    def run(x, w):
        return call(x, w).astype(jnp.float32).sum()

    float(run(x, w))
    dt = min(_t(lambda: float(run(x, w))) for _ in range(3)) - rtt()
    tf = 2 * M * K * N * steps / dt / 1e12
    print(f"({M:5d},{K:4d})x({K:4d},{N:4d}) bf16: {tf:6.1f} TF/s "
          f"({dt*1e6/steps:6.2f} us/matmul)")
    return tf


def hbm_rate(mb=256):
    n = mb * 2 ** 20 // 4
    x = jnp.arange(n, dtype=jnp.float32)

    @jax.jit
    def stream(x):
        def body(c, i):
            return c + (x + i.astype(jnp.float32) * 1e-9).sum() * 1e-9, None
        out, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(20, dtype=jnp.float32))
        return out
    float(stream(x))
    dt = (min(_t(lambda: float(stream(x))) for _ in range(3)) - rtt()) / 20
    gbs = mb / 1024 / dt
    print(f"HBM stream ({mb} MB reads): {gbs:.0f} GB/s")
    return gbs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--what", default="all")
    args = ap.parse_args()
    B = args.batch

    if args.what == "int8":
        for M, K, N in ((256, 768, 3072), (512, 768, 768), (2048, 2048, 2048)):
            mxu_rate(M, K, N, steps=2000, dtype=jnp.int8)
            mxu_rate(M, K, N, steps=2000, dtype=jnp.bfloat16)
        return

    if args.what == "mlp_tiles":
        for M in (64, 128, 256, 512):
            mxu_rate(M, 768, 3072, steps=max(500, 512000 // M))
            mxu_rate(M, 3072, 768, steps=max(500, 512000 // M))
        for M in (96, 400, 800):
            mxu_rate(M, 768, 768, steps=max(500, 512000 // M))
        return

    print("== pure-MXU ceilings at ViT-B/16 tower shapes ==")
    # attention projections at block_b=4 merged rows / per-item rows
    r_proj = mxu_rate(800, 768, 768)
    mxu_rate(200, 768, 768)
    # SDPA logits / pv (per head; K- and N-thin)
    r_log = mxu_rate(1200, 64, 256, steps=4000)
    r_pv = mxu_rate(1200, 256, 64, steps=4000)
    # MLP halves at tile=256
    r_fc1 = mxu_rate(256, 768, 3072)
    r_fc2 = mxu_rate(256, 3072, 768)
    # patchify
    r_patch = mxu_rate(1024, 768, 768)
    bw = hbm_rate()

    # Minimum tower time from ceilings (per batch of B images, S=200
    # query rows / 256 key rows, d=768, m=3072, 12 layers):
    S, SP, d, m, L, H = 200, 256, 768, 3072, 12, 12
    proj_f = 4 * 2 * B * S * d * d
    sdpa_log = 2 * B * H * S * SP * 64
    sdpa_pv = 2 * B * H * S * SP * 64
    mlp_f = 2 * 2 * B * S * d * m
    patch_f = 2 * B * 196 * d * d
    t_layer = (proj_f / (r_proj * 1e12) + sdpa_log / (r_log * 1e12)
               + sdpa_pv / (r_pv * 1e12)
               + mlp_f / (2 / (1 / r_fc1 + 1 / r_fc2) * 1e12))
    t_min = L * t_layer + patch_f / (r_patch * 1e12)
    # unavoidable HBM: x in/out per kernel (2 kernels/layer) + weights
    io_bytes = L * (4 * B * S * d * 2 + (4 * d * d + 2 * d * m) * 2)
    t_io = io_bytes / (bw * 2 ** 30)
    rate_min = B / t_min
    print(f"\nper-batch({B}) pure-matmul floor: {t_min*1000:.2f} ms "
          f"-> {rate_min:.0f} slices/s (zero overhead)")
    print(f"HBM floor if NOT overlapped: {t_io*1000:.2f} ms")
    print(f"target 5000 slices/s needs <= {B/5000*1000:.2f} ms/batch")


if __name__ == "__main__":
    main()
