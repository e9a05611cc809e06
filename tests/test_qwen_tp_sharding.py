"""Tensor-parallel sharding of the Qwen3-VL text decoder on a mesh.

Validates the serving story for the 8B judge: params sharded per
training/sharding_rules.py over the ``model`` axis, forward jitted over
the mesh, logits identical to the replicated run.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.test_qwen3_vl_parity import my_config, tiny_hf_model
from emr2a_tpu.models.qwen3_vl import (
    Qwen3VLModel,
    compute_mrope_position_ids,
    convert_hf_qwen3_vl,
)
from emr2a_tpu.parallel.mesh import create_mesh
from emr2a_tpu.training import param_shardings


def test_qwen_text_tp_forward(mesh8):
    mesh = create_mesh((4, 2))
    model, cfg = tiny_hf_model()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_hf_qwen3_vl(sd, vision_depth=3, text_layers=2)
    mycfg = my_config(cfg)
    mymodel = Qwen3VLModel(mycfg)

    input_ids = np.array([[3, 5, 8, 13, 21, 34, 2, 9]] * 4, dtype=np.int64)
    pos = compute_mrope_position_ids(input_ids, [], mycfg.image_token_id)

    # replicated golden
    golden, _ = mymodel.apply({"params": params}, jnp.asarray(input_ids),
                              jnp.asarray(pos))

    shardings = param_shardings(params, mesh)
    sharded_params = jax.tree_util.tree_map(jax.device_put, params, shardings)
    # q/k/v kernels column-sharded over model axis
    qk = sharded_params["language_model"]["layer_0"]["q_proj"]["kernel"]
    assert qk.sharding.spec == P(None, "model")

    @jax.jit
    def fwd(p, ids, pos):
        ids = jax.lax.with_sharding_constraint(
            ids, NamedSharding(mesh, P("data", None)))
        logits, _ = mymodel.apply({"params": p}, ids, pos)
        return logits

    out = fwd(sharded_params, jnp.asarray(input_ids), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(out), np.asarray(golden),
                               atol=2e-4, rtol=1e-3)
