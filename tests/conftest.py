"""Test harness: force an 8-device virtual CPU mesh.

Sharded retrieval and the global top-k merge are tested without real
multi-chip hardware by routing JAX to 8 host-platform devices
(SURVEY.md §4d).  Must run before any JAX backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from emr2a_tpu.parallel.mesh import create_mesh
    assert len(jax.devices()) == 8, jax.devices()
    return create_mesh((8, 1))


@pytest.fixture()
def rng():
    return np.random.RandomState(0)
