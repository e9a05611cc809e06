"""DINOv3 flax tower vs random-init HF DINOv3ViTModel."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from emr2a_tpu.models.dinov3 import DINOv3Config, DINOv3ViT, convert_hf_dinov3


@pytest.mark.parametrize("gated,registers", [(False, 0), (True, 2)])
def test_dinov3_parity(rng, gated, registers):
    from transformers import DINOv3ViTConfig, DINOv3ViTModel
    hcfg = DINOv3ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=32, patch_size=16,
        num_register_tokens=registers, use_gated_mlp=gated,
        rope_theta=100.0, attn_implementation="eager")
    torch.manual_seed(0)
    model = DINOv3ViTModel(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = DINOv3Config(
        image_size=32, patch_size=16, hidden_size=64, num_layers=2,
        num_heads=2, mlp_dim=128, num_register_tokens=registers,
        use_gated_mlp=gated, rope_theta=100.0)
    tower = DINOv3ViT(cfg, pooling="none")
    params = convert_hf_dinov3(sd, num_layers=2)

    pixels = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        expected = model(torch.tensor(pixels.transpose(0, 3, 1, 2))
                         ).last_hidden_state.numpy()
    got = np.asarray(tower.apply({"params": params}, pixels))
    np.testing.assert_allclose(got, expected, atol=3e-4, rtol=1e-3)


def test_dinov3_mean_pool_matches_reference_semantics(rng):
    from transformers import DINOv3ViTConfig, DINOv3ViTModel
    hcfg = DINOv3ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=32, patch_size=16,
        num_register_tokens=0, attn_implementation="eager")
    torch.manual_seed(1)
    model = DINOv3ViTModel(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = DINOv3Config(image_size=32, patch_size=16, hidden_size=64,
                       num_layers=2, num_heads=2, mlp_dim=128,
                       num_register_tokens=0)
    tower = DINOv3ViT(cfg, pooling="mean_all")
    params = convert_hf_dinov3(sd, num_layers=2)

    pixels = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        hidden = model(torch.tensor(pixels.transpose(0, 3, 1, 2))
                       ).last_hidden_state.numpy()
    expected = hidden.mean(axis=1)  # dino_encoder.py:52-57 mean over tokens
    got = np.asarray(tower.apply({"params": params}, pixels))
    np.testing.assert_allclose(got, expected, atol=3e-4, rtol=1e-3)


def test_quantized_dinov3_matches_float(rng):
    """W8A8 DINOv3 (all 7 block projections through the streaming int8
    kernel; RoPE/softmax/LayerScale bf16) tracks the float tower."""
    import jax
    import jax.numpy as jnp

    from emr2a_tpu.models.dinov3 import DINOv3Config, DINOv3ViT
    from emr2a_tpu.models.quantize import quantize_params_tree

    cfg = DINOv3Config(image_size=32, patch_size=16, hidden_size=64,
                       num_layers=2, num_heads=4, mlp_dim=128,
                       num_register_tokens=2)
    tower = DINOv3ViT(cfg, pooling="mean_all")
    x = jnp.asarray(rng.randn(2, 32, 32, 3) * 0.5, jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), x)["params"]
    ref = np.asarray(tower.apply({"params": params}, x), np.float64)
    got = np.asarray(tower.apply(
        {"params": quantize_params_tree(params)}, x), np.float64)
    cos = (ref * got).sum(1) / (np.linalg.norm(ref, axis=1)
                                * np.linalg.norm(got, axis=1))
    assert cos.min() > 0.995, cos
