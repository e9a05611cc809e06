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


# Modules dominated by multi-second jit compiles (serving chunks, DCN
# subprocesses, torch parity model builds) — measured >=7s/test on the
# 1-core box.  `-m "not slow"` is the fast lane (~5 min vs ~16 min
# full); run the full suite before committing serving or model work.
_SLOW_MODULES = {
    "test_serving", "test_serving_tp", "test_speculative",
    "test_multiprocess_dcn",
    "test_training", "test_quantized_tower", "test_baselines",
    "test_qwen3_vl_parity", "test_qwen_encoder_backend",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.purebasename in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: jit-compile-heavy tests (serving/DCN/parity)")
    # assert_allclose treats NaN == NaN as equal by default, which
    # silently passes symmetric-failure comparisons (both sides NaN,
    # as happened with an out-of-vocab toy tokenizer).  Reject NaN in
    # either operand of float comparisons suite-wide.
    import numpy as _np
    orig = _np.testing.assert_allclose

    def strict_allclose(actual, desired, *args, **kw):
        for name, arr in (("actual", actual), ("desired", desired)):
            a = _np.asarray(arr)
            if a.dtype.kind == "f" and _np.isnan(a).any():
                raise AssertionError(
                    f"assert_allclose: {name} contains NaN "
                    "(NaN==NaN would otherwise pass silently)")
        return orig(actual, desired, *args, **kw)

    _np.testing.assert_allclose = strict_allclose
