"""Device mesh construction.

The reference has no distributed machinery at all (SURVEY.md §2.2): it is
single-GPU torch with per-item Python loops.  Here the mesh is the
foundation of every compute path — batches shard over ``data``, large
towers (Qwen3-VL 8B) shard over ``model``, and the retrieval database
shards its case axis over ``data`` (see retrieval/database.py).

Multi-host bring-up rides ``jax.distributed.initialize`` (DCN); within a
pod, XLA collectives ride ICI automatically once shardings are annotated.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"

_default_mesh: Optional[Mesh] = None


def local_device_count() -> int:
    return jax.local_device_count()


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) bring-up. No-op for single-process runs."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def create_mesh(mesh_shape: Sequence[int] = (-1, 1),
                axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a Mesh. A single ``-1`` absorbs all remaining devices.

    v5e pods are 2D tori; ``mesh_utils`` picks an ICI-contiguous device
    order so that the ``data`` axis collectives (query all-gather, top-k
    merge gather) ride neighbouring ICI links.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    shape = list(mesh_shape)
    if shape.count(-1) > 1:
        raise ValueError(f"At most one -1 allowed in mesh_shape, got {mesh_shape}")
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        if n % known != 0:
            raise ValueError(f"{n} devices not divisible by fixed axes {known}")
        shape[shape.index(-1)] = n // known
    total = int(np.prod(shape))
    if total != n:
        raise ValueError(f"mesh_shape {shape} needs {total} devices, have {n}")
    try:
        from jax.experimental import mesh_utils
        dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def default_mesh(refresh: bool = False) -> Mesh:
    """Process-wide default mesh: all devices on ``data``, model=1."""
    global _default_mesh
    if _default_mesh is None or refresh:
        _default_mesh = create_mesh((-1, 1))
    return _default_mesh


def set_default_mesh(mesh: Mesh) -> None:
    global _default_mesh
    _default_mesh = mesh


def force_cpu_devices(n: int = 8) -> None:
    """Test helper: route JAX to ``n`` virtual CPU devices.

    Must run before any backend initialization.  Used by tests/conftest.py
    so sharded retrieval and the global top-k merge are exercised without
    real multi-chip hardware (SURVEY.md §4d).
    """
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    jax.config.update("jax_platforms", "cpu")
    global _default_mesh
    _default_mesh = None
