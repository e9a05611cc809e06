"""Sharded contrastive training: dp+tp on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from emr2a_tpu.models.clip import CLIPConfig, CLIPImageTower, CLIPTextTower
from emr2a_tpu.models.text import CLIPTextConfig
from emr2a_tpu.models.vit import ViTConfig
from emr2a_tpu.parallel.mesh import create_mesh
from emr2a_tpu.training import ContrastiveTrainer, param_shardings
from emr2a_tpu.training.sharding_rules import spec_for_param


def tiny_config():
    return CLIPConfig(
        vision=ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                         num_layers=2, num_heads=2, mlp_dim=128,
                         activation="quick_gelu", use_pre_layernorm=True,
                         patch_bias=False, pooling="cls_ln"),
        text=CLIPTextConfig(vocab_size=64, max_length=16, hidden_size=64,
                            num_layers=2, num_heads=2, mlp_dim=128,
                            eos_token_id=63),
        projection_dim=32)


def test_sharding_rules():
    import jax.tree_util as jtu
    cfg = tiny_config()
    params = CLIPImageTower(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    flat = jtu.tree_leaves_with_path(params)
    specs = {jtu.keystr(path): spec_for_param(path, v) for path, v in flat}
    assert specs["['vision']['block_0']['attn']['q_proj']['kernel']"] == P(None, "model")
    assert specs["['vision']['block_0']['attn']['out_proj']['kernel']"] == P("model", None)
    assert specs["['vision']['block_0']['mlp']['fc1']['kernel']"] == P(None, "model")
    assert specs["['vision']['block_0']['mlp']['fc2']['kernel']"] == P("model", None)
    assert specs["['vision']['pos_embed']"] == P()


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_contrastive_train_step(mesh8, mesh_shape, rng):
    mesh = create_mesh(mesh_shape)
    cfg = tiny_config()
    img_tower = CLIPImageTower(cfg)
    txt_tower = CLIPTextTower(cfg)
    key = jax.random.PRNGKey(0)
    params = {
        "image": img_tower.init(key, jnp.zeros((1, 32, 32, 3)))["params"],
        "text": txt_tower.init(key, jnp.zeros((1, 8), jnp.int32))["params"],
    }

    trainer = ContrastiveTrainer(
        image_apply=lambda p, x: img_tower.apply({"params": p["image"]}, x),
        text_apply=lambda p, ids, mask: txt_tower.apply({"params": p["text"]}, ids),
        mesh=mesh, learning_rate=1e-3)
    state = trainer.init_state(params)
    train_step = trainer.make_train_step()

    B = 16
    pixels = jnp.asarray(rng.randn(B, 32, 32, 3), jnp.float32)
    ids = jnp.asarray(rng.randint(0, 62, (B, 16)), jnp.int32)
    ids = ids.at[:, -1].set(63)

    losses = []
    for _ in range(3):
        state, loss = train_step(state, pixels, ids, None)
        losses.append(float(loss))
    assert state.step == 3
    assert np.isfinite(losses).all()
    # Training on a fixed batch must reduce loss.
    assert losses[-1] < losses[0]


def test_tp_weights_actually_sharded(mesh8):
    mesh = create_mesh((4, 2))
    cfg = tiny_config()
    img_tower = CLIPImageTower(cfg)
    params = {"image": img_tower.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]}
    sharded = jax.tree_util.tree_map(
        jax.device_put, params, param_shardings(params, mesh))
    k = sharded["image"]["vision"]["block_0"]["attn"]["q_proj"]["kernel"]
    # column-parallel: second dim split over the 2-way model axis
    assert k.sharding.spec == P(None, "model")
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert shard_shapes == {(64, 32)}


def test_remat_train_step(mesh8, rng):
    """remat=True produces the same (finite, decreasing) training."""
    mesh = create_mesh((8, 1))
    cfg = tiny_config()
    img_tower = CLIPImageTower(cfg)
    txt_tower = CLIPTextTower(cfg)
    key = jax.random.PRNGKey(0)
    params = {
        "image": img_tower.init(key, jnp.zeros((1, 32, 32, 3)))["params"],
        "text": txt_tower.init(key, jnp.zeros((1, 8), jnp.int32))["params"],
    }
    trainer = ContrastiveTrainer(
        image_apply=lambda p, x: img_tower.apply({"params": p["image"]}, x),
        text_apply=lambda p, ids, mask: txt_tower.apply({"params": p["text"]}, ids),
        mesh=mesh, learning_rate=1e-3, remat=True)
    state = trainer.init_state(params)
    step = trainer.make_train_step()
    pixels = jnp.asarray(rng.randn(8, 32, 32, 3), jnp.float32)
    ids = jnp.asarray(rng.randint(0, 62, (8, 16)), jnp.int32).at[:, -1].set(63)
    losses = []
    for _ in range(3):
        state, loss = step(state, pixels, ids, None)
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_checkpoint_resume_exact(mesh8, rng, tmp_path):
    """save_state/restore_state resume training exactly: a run
    interrupted after 2 steps and resumed matches an uninterrupted
    4-step run (params, adam moments, and step all restored)."""
    cfg = tiny_config()
    img_tower = CLIPImageTower(cfg)
    txt_tower = CLIPTextTower(cfg)
    key = jax.random.PRNGKey(0)
    params = {
        "image": img_tower.init(key, jnp.zeros((1, 32, 32, 3)))["params"],
        "text": txt_tower.init(key, jnp.zeros((1, 8), jnp.int32))["params"],
    }
    mk = lambda: ContrastiveTrainer(
        image_apply=lambda p, x: img_tower.apply({"params": p["image"]}, x),
        text_apply=lambda p, ids, mask: txt_tower.apply({"params": p["text"]},
                                                        ids),
        mesh=mesh8, learning_rate=1e-3)
    B = 16
    pixels = jnp.asarray(rng.randn(B, 32, 32, 3), jnp.float32)
    ids = jnp.asarray(rng.randint(0, 62, (B, 16)), jnp.int32)
    ids = ids.at[:, -1].set(63)

    trainer = mk()
    step_fn = trainer.make_train_step()
    state = trainer.init_state(params)
    ref_losses = []
    for _ in range(4):
        state, loss = step_fn(state, pixels, ids, None)
        ref_losses.append(float(loss))

    trainer2 = mk()
    step2 = trainer2.make_train_step()
    s2 = trainer2.init_state(params)
    for _ in range(2):
        s2, _ = step2(s2, pixels, ids, None)
    trainer2.save_state(s2, tmp_path / "ckpt")

    trainer3 = mk()
    step3 = trainer3.make_train_step()
    template = trainer3.init_state(params)
    s3 = trainer3.restore_state(template, tmp_path / "ckpt")
    assert int(s3.step) == 2
    resumed = []
    for _ in range(2):
        s3, loss = step3(s3, pixels, ids, None)
        resumed.append(float(loss))
    np.testing.assert_allclose(resumed, ref_losses[2:], rtol=1e-5)
