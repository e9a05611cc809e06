"""Worker for tests/test_multiprocess_dcn.py — one of two processes.

Brings up jax.distributed (the multi-host DCN path,
parallel/mesh.initialize_distributed), builds a global mesh whose
``data`` axis spans BOTH processes, shards the retrieval database
across it (each process contributes only its local slab), and runs the
sharded top-k — per-shard scan + cross-process all-gather merge
(retrieval/database._sharded_topk_fn).  Asserts exact agreement with
the local numpy reference, including the masked capacity tail.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

# ONE device per process — the parent pytest's conftest exports
# XLA_FLAGS=--xla_force_host_platform_device_count=8, which this
# subprocess would inherit (16 global devices instead of 2).
os.environ["XLA_FLAGS"] = " ".join(
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f)

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

pid, port = int(sys.argv[1]), sys.argv[2]

from emr2a_tpu.parallel.mesh import DATA_AXIS, initialize_distributed

initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)

import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import Mesh, PartitionSpec as P

from emr2a_tpu.retrieval.database import _sharded_topk_fn

assert jax.process_count() == 2, jax.process_count()
mesh = Mesh(np.array(jax.devices()), (DATA_AXIS,))

rng = np.random.RandomState(0)  # same on both processes
db = rng.randn(16, 8).astype(np.float32)
db /= np.linalg.norm(db, axis=1, keepdims=True)
queries = rng.randn(3, 8).astype(np.float32)
queries /= np.linalg.norm(queries, axis=1, keepdims=True)
shard_size = 8
n_total, k = 14, 5  # rows 14-15 are capacity padding: must be masked

# each process hands over ONLY its local slab / its replica
gdb = multihost_utils.host_local_array_to_global_array(
    db[pid * shard_size:(pid + 1) * shard_size], mesh, P(DATA_AXIS, None))
gq = multihost_utils.host_local_array_to_global_array(queries, mesh, P())

fn = jax.jit(jax.shard_map(
    functools.partial(_sharded_topk_fn, k=k, shard_size=shard_size,
                      use_pallas=False),
    mesh=mesh, in_specs=(P(), P(DATA_AXIS, None), P()),
    out_specs=(P(), P()), check_vma=False))
vals, idx = fn(gq, gdb, jnp.int32(n_total))

got_idx = np.asarray(idx.addressable_data(0))
got_vals = np.asarray(vals.addressable_data(0))
scores = queries @ db[:n_total].T
ref_idx = np.argsort(-scores, axis=1)[:, :k]
np.testing.assert_array_equal(got_idx, ref_idx)
np.testing.assert_allclose(
    got_vals, np.take_along_axis(scores, ref_idx, axis=1), rtol=1e-5)
print(f"p{pid}: DCN sharded retrieval OK", flush=True)
