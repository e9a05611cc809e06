"""Probe the Mosaic VMEM budget on this chip: compile a trivial kernel
with increasing VMEM scratch until compilation fails."""
import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, o_ref, scratch):
    scratch[0, :] = x_ref[0, :]
    o_ref[:, :] = x_ref[:, :] + scratch[0, 0]


def try_mb(mb):
    rows = mb * 1024 * 1024 // (128 * 4)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
    )
    x = jnp.ones((8, 128), jnp.float32)
    try:
        jax.jit(f)(x).block_until_ready()
        return True
    except Exception as e:
        msg = str(e).splitlines()[0][:120]
        print(f"  {mb} MB failed: {msg}")
        return False


if __name__ == "__main__":
    for mb in (8, 10, 12, 13, 14, 15, 16):
        ok = try_mb(mb)
        print(f"scratch {mb} MB: {'OK' if ok else 'FAIL'}")
        if not ok:
            break
