"""NamedSharding helpers used across the framework."""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emr2a_tpu.parallel.mesh import DATA_AXIS, default_mesh


def replicated(mesh: Optional[Mesh] = None) -> NamedSharding:
    mesh = mesh or default_mesh()
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Optional[Mesh] = None, axis: str = DATA_AXIS,
                   ndim: int = 2) -> NamedSharding:
    """Shard dim 0 over ``axis``, replicate the rest."""
    mesh = mesh or default_mesh()
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(x: jax.Array, mesh: Optional[Mesh] = None,
                axis: str = DATA_AXIS) -> jax.Array:
    """device_put a host array with its leading dim sharded over ``axis``.

    The leading dim must be divisible by the axis size — callers pad
    (see ops.topk.pad_to_multiple) before sharding.
    """
    return jax.device_put(x, batch_sharding(mesh, axis, ndim=x.ndim))


def with_sharding(x: jax.Array, spec: P, mesh: Optional[Mesh] = None) -> jax.Array:
    mesh = mesh or default_mesh()
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
