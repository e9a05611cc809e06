"""Probe: native jnp.int4 weight refs in Pallas vs manual nibble unpack.

The W4A8 streaming kernel (ops/linear_int4) measures 442 GB/s
effective on the 8B decode — the i32-shift unpack costs more than the
DMA it saves (docs/PERF_NOTES.md).  If Mosaic can load a jnp.int4 ref
and widen it natively, the unpack VPU tax disappears.  Three timings
at a decode-ish projection shape (T=32, K=4096, N=4096), 200-iter
scan chains, RTT-subtracted:

  1. s8 weights, plain dot               (the W8 per-projection cost)
  2. native int4 ref -> astype(int8) dot (probe: does it legalize? fast?)
  3. manual packed-byte unpack dot       (what ships today)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _t(f):
    t0 = time.time()
    f()
    return time.time() - t0


def rtt():
    @jax.jit
    def empty(x):
        return x + 1.0
    float(empty(jnp.float32(0)))
    return min(_t(lambda: float(empty(jnp.float32(i)))) for i in range(1, 4))


def chain_time(call, x0, iters=3000):
    @jax.jit
    def chain(x):
        def body(c, i):
            y = call(x + i.astype(x.dtype))
            return c + y[0, 0].astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(iters, dtype=jnp.int32))
        return out

    float(chain(x0))
    return (min(_t(lambda: float(chain(x0))) for _ in range(3)) - rtt()) / iters


def main():
    T, K, N = 32, 4096, 2048
    rng = np.random.RandomState(0)
    xq = jnp.asarray(rng.randint(-127, 128, (T, K)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-7, 8, (K, N)), jnp.int8)

    # -- 1. plain s8 dot ----------------------------------------------------
    def k8(x_ref, w_ref, o_ref):
        o_ref[:, :] = jax.lax.dot_general(
            x_ref[:, :], w_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    @functools.partial(jax.jit)
    def run8(x):
        return pl.pallas_call(
            k8,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, N), jnp.int32),
        )(x, w8)

    dt = chain_time(run8, xq)
    print(f"s8 dot        ({T},{K})x({K},{N}): {dt*1e6:8.1f} us  "
          f"({K*N/dt/1e9:.0f} GB/s weight stream)", flush=True)

    # -- 2. native int4 ref -------------------------------------------------
    # Off by default: measured on this runtime, creating a jnp.int4
    # array fails UNIMPLEMENTED *and leaves the backend wedged* (the
    # next unrelated int8 op also fails) — pass --native to retry on a
    # newer stack.
    try:
        if "--native" not in sys.argv:
            raise NotImplementedError(
                "skipped (UNIMPLEMENTED on this runtime; --native to retry)")
        w4 = w8.astype(jnp.int4)

        def k4(x_ref, w_ref, o_ref):
            w = w_ref[:, :].astype(jnp.int8)
            o_ref[:, :] = jax.lax.dot_general(
                x_ref[:, :], w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        @functools.partial(jax.jit)
        def run4(x):
            return pl.pallas_call(
                k4,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((T, N), jnp.int32),
            )(x, w4)

        got = np.asarray(run4(xq))
        ref = np.asarray(run8(xq))
        ok = np.array_equal(got, ref)
        dt4 = chain_time(run4, xq)
        print(f"native int4   ({T},{K})x({K},{N}): {dt4*1e6:8.1f} us  "
              f"({K*N//2/dt4/1e9:.0f} GB/s weight stream)  exact={ok}",
              flush=True)
    except Exception as e:
        print(f"native int4: FAILED — {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # -- 3. manual unpack (shipped) ----------------------------------------
    from emr2a_tpu.ops.linear_int4 import _unpack_nibbles

    packed = jnp.asarray(rng.randint(-128, 128, (K // 2, N)), jnp.int8)

    def km(x_ref, w_ref, o_ref):
        # per-group unpack exactly like ops/linear_int4._linear_kernel_w4
        # (whole-block widening to i32 OOMs scoped VMEM — observed)
        group, h = 128, 64
        acc = jnp.zeros((T, N), jnp.int32)
        for g in range(K // group):
            low, high = _unpack_nibbles(w_ref[g * h:(g + 1) * h, :])
            acc += jax.lax.dot_general(
                x_ref[:, g * group:g * group + h], low,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc += jax.lax.dot_general(
                x_ref[:, g * group + h:(g + 1) * group], high,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        o_ref[:, :] = acc

    @functools.partial(jax.jit)
    def runm(x):
        return pl.pallas_call(
            km,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, N), jnp.int32),
        )(x, packed)

    dtm = chain_time(runm, xq)
    print(f"manual unpack ({T},{K})x({K},{N}): {dtm*1e6:8.1f} us  "
          f"({K*N//2/dtm/1e9:.0f} GB/s weight stream)", flush=True)


if __name__ == "__main__":
    main()
