"""Parameter sharding rules: Megatron-style tensor parallelism for the
flax towers over the mesh ``model`` axis.

The reference has no TP at all (SURVEY.md §2.2; its closest feature is
HF ``device_map="auto"`` layer placement).  Here every Dense in the
towers gets a PartitionSpec by role:

- column-parallel (out features sharded): q/k/v projections, MLP fc1 /
  up/gate — P(None, "model")
- row-parallel (in features sharded): attention out_proj, MLP fc2 /
  down — P("model", None)
- embeddings / layernorms / biases of row-parallel layers: replicated.

XLA inserts the all-reduce after row-parallel matmuls automatically
once these shardings are annotated — no hand-written collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emr2a_tpu.parallel.mesh import MODEL_AXIS

_COLUMN_PARALLEL = ("q_proj", "k_proj", "v_proj", "fc1", "up_proj",
                    "gate_proj", "query", "key", "value")
_ROW_PARALLEL = ("out_proj", "o_proj", "fc2", "down_proj")


def spec_for_param(path: tuple, value) -> P:
    """PartitionSpec for one param, from its tree path + shape."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    leaf = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""

    if leaf == "kernel" and value.ndim == 2:
        if parent in _COLUMN_PARALLEL:
            return P(None, MODEL_AXIS)
        if parent in _ROW_PARALLEL:
            return P(MODEL_AXIS, None)
    if leaf == "bias" and parent in _COLUMN_PARALLEL:
        return P(MODEL_AXIS)
    return P()


def param_shardings(params, mesh: Optional[Mesh] = None):
    """NamedSharding tree for a param tree (replicate what has no rule)."""
    from emr2a_tpu.parallel.mesh import default_mesh
    mesh = mesh or default_mesh()

    def to_sharding(path, value):
        return NamedSharding(mesh, spec_for_param(path, value))

    return jax.tree_util.tree_map_with_path(to_sharding, params)
