"""Mesh-sharded contrastive fine-tuning for the dual-tower encoders.

Net-new vs the reference (its only training loop is the CNN baseline,
baselines/cnn_baseline/train_cnn_baseline.py).  Fine-tuning the
retrieval towers on in-domain CT data is the natural extension of the
reference's capability set, and it exercises the full dp+tp story:

- batch axis sharded over ``data`` (pure DP),
- tower weights sharded over ``model`` per training/sharding_rules.py
  (Megatron TP; XLA inserts the collectives),
- optimizer state inherits the param shardings (ZeRO-style: sharded
  where params are sharded),
- dtype follows the params you pass (cast towers to bf16 for bf16
  compute; optimizer moments then match — no separate f32 master
  copy is kept), donated buffers.

PP / SP / EP are structurally N/A for this workload (SURVEY.md §5:
towers fit one chip at ≤8B with TP, sequences are ≤257 tokens, no MoE).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emr2a_tpu.parallel.mesh import DATA_AXIS, default_mesh
from emr2a_tpu.training.sharding_rules import param_shardings


def clip_contrastive_loss(img_feats: jax.Array, txt_feats: jax.Array,
                          temperature: float = 0.07) -> jax.Array:
    """Symmetric InfoNCE over the global batch."""
    zi = img_feats / (jnp.linalg.norm(img_feats, axis=-1, keepdims=True) + 1e-8)
    zt = txt_feats / (jnp.linalg.norm(txt_feats, axis=-1, keepdims=True) + 1e-8)
    logits = (zi @ zt.T) / temperature
    labels = jnp.arange(logits.shape[0])
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return (li.mean() + lt.mean()) / 2


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


class ContrastiveTrainer:
    """Builds a jitted, mesh-sharded train step for (image_apply,
    text_apply) towers sharing a params pytree."""

    def __init__(self,
                 image_apply: Callable,   # (params, pixels) -> feats
                 text_apply: Callable,    # (params, ids, mask) -> feats
                 mesh: Optional[Mesh] = None,
                 learning_rate: float = 1e-5,
                 weight_decay: float = 0.01,
                 temperature: float = 0.07,
                 remat: bool = False):
        self.mesh = mesh or default_mesh()
        # jax.checkpoint trades recompute for activation HBM — turn on
        # for large towers / big batches.
        if remat:
            image_apply = jax.checkpoint(image_apply)
            text_apply = jax.checkpoint(text_apply)
        self.image_apply = image_apply
        self.text_apply = text_apply
        self.temperature = temperature
        self.optimizer = optax.adamw(learning_rate, weight_decay=weight_decay)

    def init_state(self, params) -> TrainState:
        """Shard params per TP rules; optimizer state (adam mu/nu) inherits
        the param shardings through XLA's sharding propagation."""
        shardings = param_shardings(params, self.mesh)
        # jit (not device_put) so the state owns FRESH buffers: device_put
        # may alias the caller's arrays, and the donated train step would
        # then delete them out from under the caller.
        params = jax.jit(lambda p: p, out_shardings=shardings)(params)
        opt_state = jax.jit(self.optimizer.init)(params)
        # adam mu/nu inherit the *sharded* param shardings through
        # propagation, but replicated leaves (biases, scalars) collapse
        # to single-device — normalize every leaf that doesn't span the
        # mesh to mesh-replicated, so save/restore round-trips one
        # coherent device set.
        rep = NamedSharding(self.mesh, P())
        n_dev = self.mesh.size
        opt_state = jax.tree_util.tree_map(
            lambda x: x if len(x.sharding.device_set) == n_dev
            else jax.device_put(x, rep),
            opt_state)
        return TrainState(params=params, opt_state=opt_state,
                          step=jax.device_put(jnp.zeros((), jnp.int32), rep))

    # -- checkpoint/resume (full training state, shardings preserved) --

    def save_state(self, state: TrainState, directory) -> None:
        """Persist params + optimizer moments + step as one Orbax
        checkpoint (sharded arrays are gathered/written per-host)."""
        from pathlib import Path
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(Path(directory).absolute(), state)
        ckptr.wait_until_finished()

    def restore_state(self, template: TrainState, directory) -> TrainState:
        """Restore into the shardings of ``template`` (build it with
        ``init_state`` on the current mesh; resume is then exact —
        adam moments and step included)."""
        from pathlib import Path
        import orbax.checkpoint as ocp
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding),
            template)
        return ocp.StandardCheckpointer().restore(
            Path(directory).absolute(), abstract)

    def make_train_step(self):
        mesh = self.mesh
        batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

        def loss_fn(params, pixels, ids, mask):
            zi = self.image_apply(params, pixels)
            zt = self.text_apply(params, ids, mask)
            return clip_contrastive_loss(zi, zt, self.temperature)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, pixels, ids, mask
                       ) -> Tuple[TrainState, jax.Array]:
            pixels = jax.lax.with_sharding_constraint(pixels, batch_sharding)
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, pixels, ids, mask)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

        return train_step
