"""Parity: flax towers + converters vs randomly-initialized HF torch models.

Small configs so CPU torch forward is fast; weights come from the torch
model via the converters, so these tests pin both architecture and
conversion correctness.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from emr2a_tpu.models import (
    BertConfig,
    BertEncoder,
    CLIPConfig,
    CLIPImageTower,
    CLIPTextConfig,
    CLIPTextTower,
    ViTConfig,
    VisionTransformer,
)
from emr2a_tpu.models.convert import (
    convert_hf_bert,
    convert_hf_clip_image_tower,
    convert_hf_clip_text_tower,
    convert_hf_vit,
    convert_timm_vit,
    torch_state_dict_to_numpy,
)

ATOL = 2e-4


def small_hf_clip():
    from transformers import CLIPConfig as HFCLIPConfig, CLIPModel
    cfg = HFCLIPConfig(
        text_config=dict(hidden_size=64, intermediate_size=128,
                         num_hidden_layers=2, num_attention_heads=2,
                         max_position_embeddings=16, vocab_size=100,
                         eos_token_id=99, pad_token_id=99,
                         bos_token_id=98),
        vision_config=dict(hidden_size=64, intermediate_size=128,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=32, patch_size=16),
        projection_dim=32)
    torch.manual_seed(0)
    return CLIPModel(cfg).eval(), cfg


@pytest.fixture(scope="module")
def hf_clip():
    return small_hf_clip()


def test_clip_vision_parity(hf_clip, rng):
    model, cfg = hf_clip
    sd = torch_state_dict_to_numpy(model.state_dict())
    vcfg = ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                     num_layers=2, num_heads=2, mlp_dim=128,
                     activation="quick_gelu", use_pre_layernorm=True,
                     patch_bias=False, pooling="cls_ln", ln_eps=1e-5)
    tower = CLIPImageTower(CLIPConfig(vision=vcfg, text=None, projection_dim=32))
    params = convert_hf_clip_image_tower(sd, num_layers=2)

    pixels = rng.randn(3, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        expected = model.get_image_features(
            pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(tower.apply({"params": params}, pixels))
    np.testing.assert_allclose(got, expected, atol=ATOL, rtol=1e-3)


def test_clip_text_parity(hf_clip, rng):
    model, cfg = hf_clip
    sd = torch_state_dict_to_numpy(model.state_dict())
    tcfg = CLIPTextConfig(vocab_size=100, max_length=16, hidden_size=64,
                          num_layers=2, num_heads=2, mlp_dim=128,
                          activation="quick_gelu", eos_token_id=99)
    tower = CLIPTextTower(CLIPConfig(vision=None, text=tcfg, projection_dim=32))
    params = convert_hf_clip_text_tower(sd, num_layers=2)

    ids = np.array([[98, 5, 6, 7, 99, 99, 99, 99],
                    [98, 11, 12, 99, 99, 99, 99, 99]], dtype=np.int32)
    with torch.no_grad():
        expected = model.get_text_features(
            input_ids=torch.tensor(ids, dtype=torch.long)).numpy()
    got = np.asarray(tower.apply({"params": params}, ids))
    np.testing.assert_allclose(got, expected, atol=ATOL, rtol=1e-3)


def test_hf_vit_parity(rng):
    from transformers import ViTConfig as HFViTConfig, ViTModel
    hcfg = HFViTConfig(hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=128,
                       image_size=32, patch_size=16)
    torch.manual_seed(1)
    model = ViTModel(hcfg, add_pooling_layer=False).eval()
    sd = torch_state_dict_to_numpy(model.state_dict())
    vcfg = ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                     num_layers=2, num_heads=2, mlp_dim=128,
                     ln_eps=1e-12, pooling="mean")
    tower = VisionTransformer(vcfg)
    params = convert_hf_vit(sd, num_layers=2)

    pixels = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        hidden = model(torch.tensor(pixels.transpose(0, 3, 1, 2))
                       ).last_hidden_state.numpy()
    expected = hidden[:, 1:].mean(axis=1)  # HF convention: LN then mean
    got = np.asarray(tower.apply({"params": params}, pixels))
    np.testing.assert_allclose(got, expected, atol=ATOL, rtol=1e-3)


def test_timm_avg_fc_norm_pooling(rng):
    """timm global_pool="avg": mean of patch tokens FIRST, then fc_norm
    (pre-pool norm is Identity in that config)."""
    from transformers import ViTConfig as HFViTConfig, ViTModel
    hcfg = HFViTConfig(hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=128,
                       image_size=32, patch_size=16)
    torch.manual_seed(4)
    model = ViTModel(hcfg, add_pooling_layer=False).eval()
    sd = torch_state_dict_to_numpy(model.state_dict())
    vcfg = ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                     num_layers=2, num_heads=2, mlp_dim=128,
                     ln_eps=1e-12, pooling="avg_fc_norm")
    tower = VisionTransformer(vcfg)
    params = convert_hf_vit(sd, num_layers=2)

    pixels = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        out = model(torch.tensor(pixels.transpose(0, 3, 1, 2)),
                    output_hidden_states=True)
        pre_ln = out.hidden_states[-1].numpy()  # before final layernorm
    pooled = pre_ln[:, 1:].mean(axis=1)
    w = sd["layernorm.weight"]
    b = sd["layernorm.bias"]
    mu = pooled.mean(-1, keepdims=True)
    var = ((pooled - mu) ** 2).mean(-1, keepdims=True)
    expected = (pooled - mu) / np.sqrt(var + 1e-12) * w + b
    got = np.asarray(tower.apply({"params": params}, pixels))
    np.testing.assert_allclose(got, expected, atol=ATOL, rtol=1e-3)


def test_timm_vit_converter_roundtrip(rng):
    """No timm in env: build a synthetic timm-style state dict from an
    HF ViT's weights (fused qkv) and check both converters agree."""
    from transformers import ViTConfig as HFViTConfig, ViTModel
    hcfg = HFViTConfig(hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=128,
                       image_size=32, patch_size=16)
    torch.manual_seed(2)
    model = ViTModel(hcfg, add_pooling_layer=False).eval()
    sd = torch_state_dict_to_numpy(model.state_dict())

    timm_sd = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed.proj.weight": sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias": sd["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    for i in range(2):
        p = f"encoder.layer.{i}."
        t = f"blocks.{i}."
        timm_sd[t + "attn.qkv.weight"] = np.concatenate([
            sd[p + "attention.attention.query.weight"],
            sd[p + "attention.attention.key.weight"],
            sd[p + "attention.attention.value.weight"]], axis=0)
        timm_sd[t + "attn.qkv.bias"] = np.concatenate([
            sd[p + "attention.attention.query.bias"],
            sd[p + "attention.attention.key.bias"],
            sd[p + "attention.attention.value.bias"]], axis=0)
        timm_sd[t + "attn.proj.weight"] = sd[p + "attention.output.dense.weight"]
        timm_sd[t + "attn.proj.bias"] = sd[p + "attention.output.dense.bias"]
        timm_sd[t + "norm1.weight"] = sd[p + "layernorm_before.weight"]
        timm_sd[t + "norm1.bias"] = sd[p + "layernorm_before.bias"]
        timm_sd[t + "norm2.weight"] = sd[p + "layernorm_after.weight"]
        timm_sd[t + "norm2.bias"] = sd[p + "layernorm_after.bias"]
        timm_sd[t + "mlp.fc1.weight"] = sd[p + "intermediate.dense.weight"]
        timm_sd[t + "mlp.fc1.bias"] = sd[p + "intermediate.dense.bias"]
        timm_sd[t + "mlp.fc2.weight"] = sd[p + "output.dense.weight"]
        timm_sd[t + "mlp.fc2.bias"] = sd[p + "output.dense.bias"]

    p_hf = convert_hf_vit(sd, num_layers=2)
    p_timm = convert_timm_vit(timm_sd, num_layers=2)
    import jax
    flat_hf = jax.tree_util.tree_leaves_with_path(p_hf)
    flat_timm = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_leaves_with_path(p_timm)}
    for k, v in flat_hf:
        np.testing.assert_array_equal(v, flat_timm[jax.tree_util.keystr(k)])


def test_bert_parity(rng):
    from transformers import BertConfig as HFBertConfig, BertModel
    hcfg = HFBertConfig(hidden_size=64, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=128,
                        vocab_size=200, max_position_embeddings=32)
    torch.manual_seed(3)
    model = BertModel(hcfg).eval()
    sd = torch_state_dict_to_numpy(model.state_dict())
    bcfg = BertConfig(vocab_size=200, max_length=32, hidden_size=64,
                      num_layers=2, num_heads=2, mlp_dim=128)
    enc = BertEncoder(bcfg, pooling="cls")
    params = convert_hf_bert(sd, num_layers=2)

    ids = np.array([[101, 5, 6, 7, 102, 0, 0, 0],
                    [101, 20, 102, 0, 0, 0, 0, 0]], dtype=np.int32)
    mask = (ids != 0).astype(np.int32)
    with torch.no_grad():
        expected = model(torch.tensor(ids, dtype=torch.long),
                         attention_mask=torch.tensor(mask, dtype=torch.long)
                         ).last_hidden_state[:, 0].numpy()
    got = np.asarray(enc.apply({"params": params}, ids, mask))
    np.testing.assert_allclose(got, expected, atol=ATOL, rtol=1e-3)


# ---------------------------------------------------------------------------
# BioMedCLIP converters (open_clip CustomTextCLIP layout) — the only
# path real BiomedCLIP weights enter the system, so both converters are
# pinned against torch forwards through a synthetic open_clip-layout
# state dict (open_clip itself is not installed; the layout is
# visual.trunk.* timm keys + visual.head.proj, text.transformer.* HF
# BERT keys + bias-free text.proj.0/2 MLP — reference
# encoders/biomedclip_encoder.py:26-35).
# ---------------------------------------------------------------------------

def _synthetic_open_clip_sd(proj_dim=32):
    """(sd, vit_model, bert_model, torch proj modules) at tiny geometry."""
    from transformers import (BertConfig as HFBertConfig, BertModel,
                              ViTConfig as HFViTConfig, ViTModel)
    torch.manual_seed(7)
    vit = ViTModel(HFViTConfig(hidden_size=64, num_hidden_layers=2,
                               num_attention_heads=2, intermediate_size=128,
                               image_size=32, patch_size=16,
                               layer_norm_eps=1e-6),
                   add_pooling_layer=False).eval()
    bert = BertModel(HFBertConfig(hidden_size=64, num_hidden_layers=2,
                                  num_attention_heads=2,
                                  intermediate_size=128, vocab_size=200,
                                  max_position_embeddings=32)).eval()
    head_proj = torch.nn.Linear(64, proj_dim, bias=False).eval()
    text_hidden = (64 + proj_dim) // 2
    text_proj0 = torch.nn.Linear(64, text_hidden, bias=False).eval()
    text_proj2 = torch.nn.Linear(text_hidden, proj_dim, bias=False).eval()

    vsd = torch_state_dict_to_numpy(vit.state_dict())
    sd = {
        "visual.trunk.cls_token": vsd["embeddings.cls_token"],
        "visual.trunk.pos_embed": vsd["embeddings.position_embeddings"],
        "visual.trunk.patch_embed.proj.weight":
            vsd["embeddings.patch_embeddings.projection.weight"],
        "visual.trunk.patch_embed.proj.bias":
            vsd["embeddings.patch_embeddings.projection.bias"],
        "visual.trunk.norm.weight": vsd["layernorm.weight"],
        "visual.trunk.norm.bias": vsd["layernorm.bias"],
        "visual.head.proj.weight":
            head_proj.weight.detach().numpy(),
        "text.proj.0.weight": text_proj0.weight.detach().numpy(),
        "text.proj.2.weight": text_proj2.weight.detach().numpy(),
    }
    for i in range(2):
        p = f"encoder.layer.{i}."
        t = f"visual.trunk.blocks.{i}."
        sd[t + "attn.qkv.weight"] = np.concatenate([
            vsd[p + "attention.attention.query.weight"],
            vsd[p + "attention.attention.key.weight"],
            vsd[p + "attention.attention.value.weight"]], axis=0)
        sd[t + "attn.qkv.bias"] = np.concatenate([
            vsd[p + "attention.attention.query.bias"],
            vsd[p + "attention.attention.key.bias"],
            vsd[p + "attention.attention.value.bias"]], axis=0)
        sd[t + "attn.proj.weight"] = vsd[p + "attention.output.dense.weight"]
        sd[t + "attn.proj.bias"] = vsd[p + "attention.output.dense.bias"]
        sd[t + "norm1.weight"] = vsd[p + "layernorm_before.weight"]
        sd[t + "norm1.bias"] = vsd[p + "layernorm_before.bias"]
        sd[t + "norm2.weight"] = vsd[p + "layernorm_after.weight"]
        sd[t + "norm2.bias"] = vsd[p + "layernorm_after.bias"]
        sd[t + "mlp.fc1.weight"] = vsd[p + "intermediate.dense.weight"]
        sd[t + "mlp.fc1.bias"] = vsd[p + "intermediate.dense.bias"]
        sd[t + "mlp.fc2.weight"] = vsd[p + "output.dense.weight"]
        sd[t + "mlp.fc2.bias"] = vsd[p + "output.dense.bias"]
    for k, v in bert.state_dict().items():
        sd["text.transformer." + k] = v.detach().numpy()
    return sd, vit, bert, (head_proj, text_proj0, text_proj2)


def _tiny_biomedclip_config(proj_dim=32):
    from emr2a_tpu.models.clip import BioMedCLIPConfig
    return BioMedCLIPConfig(
        vision=ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                         num_layers=2, num_heads=2, mlp_dim=128,
                         ln_eps=1e-6, pooling="cls"),
        text=BertConfig(vocab_size=200, max_length=32, hidden_size=64,
                        num_layers=2, num_heads=2, mlp_dim=128),
        projection_dim=proj_dim, text_proj="mlp")


def test_biomedclip_image_converter_parity(rng):
    from emr2a_tpu.models.clip import BioMedCLIPImageTower
    from emr2a_tpu.models.convert import convert_biomedclip_image_tower

    sd, vit, _, (head_proj, _, _) = _synthetic_open_clip_sd()
    tower = BioMedCLIPImageTower(_tiny_biomedclip_config())
    params = convert_biomedclip_image_tower(sd, num_layers=2)

    pixels = rng.randn(3, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        cls = vit(torch.tensor(pixels.transpose(0, 3, 1, 2))
                  ).last_hidden_state[:, 0]
        expected = head_proj(cls).numpy()
    got = np.asarray(tower.apply({"params": params}, pixels))
    np.testing.assert_allclose(got, expected, atol=ATOL, rtol=1e-3)


def test_biomedclip_image_converter_bare_proj_parameter(rng):
    """open_clip checkpoints that store a bare (in, out) 'visual.proj'
    Parameter instead of a head Linear must convert identically."""
    from emr2a_tpu.models.convert import convert_biomedclip_image_tower

    sd, *_ = _synthetic_open_clip_sd()
    alt = {k: v for k, v in sd.items() if k != "visual.head.proj.weight"}
    alt["visual.proj"] = sd["visual.head.proj.weight"].T
    a = convert_biomedclip_image_tower(sd, num_layers=2)
    b = convert_biomedclip_image_tower(alt, num_layers=2)
    np.testing.assert_array_equal(a["head_proj"]["kernel"],
                                  b["head_proj"]["kernel"])


def test_biomedclip_text_converter_parity():
    from emr2a_tpu.models.clip import BioMedCLIPTextTower
    from emr2a_tpu.models.convert import convert_biomedclip_text_tower

    sd, _, bert, (_, text_proj0, text_proj2) = _synthetic_open_clip_sd()
    tower = BioMedCLIPTextTower(_tiny_biomedclip_config())
    params = convert_biomedclip_text_tower(sd, num_layers=2)

    ids = np.array([[101, 5, 6, 7, 102, 0, 0, 0],
                    [101, 20, 102, 0, 0, 0, 0, 0]], dtype=np.int32)
    mask = (ids != 0).astype(np.int32)
    with torch.no_grad():
        cls = bert(torch.tensor(ids, dtype=torch.long),
                   attention_mask=torch.tensor(mask, dtype=torch.long)
                   ).last_hidden_state[:, 0]
        expected = text_proj2(torch.nn.functional.gelu(
            text_proj0(cls))).numpy()
    got = np.asarray(tower.apply({"params": params}, ids, mask))
    np.testing.assert_allclose(got, expected, atol=ATOL, rtol=1e-3)


def test_biomedclip_encoder_model_path_loads_converted_weights(tmp_path):
    """The encoder's ``model_path`` entry (load_state_dict -> both
    converters) must produce the same param trees as converting the
    state dict directly."""
    import jax
    from emr2a_tpu.encoders.biomedclip_encoder import BioMedCLIPEncoder
    from emr2a_tpu.models.convert import (convert_biomedclip_image_tower,
                                          convert_biomedclip_text_tower)

    sd, *_ = _synthetic_open_clip_sd()
    ckpt = tmp_path / "pytorch_model.bin"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, ckpt)

    enc = BioMedCLIPEncoder(model_path=str(ckpt),
                            config=_tiny_biomedclip_config())
    expected = {"image": convert_biomedclip_image_tower(sd, 2),
                "text": convert_biomedclip_text_tower(sd, 2)}
    got_flat = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
                jax.tree_util.tree_leaves_with_path(enc.params)}
    exp_flat = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
                jax.tree_util.tree_leaves_with_path(expected)}
    assert set(got_flat) == set(exp_flat)
    for k in exp_flat:
        np.testing.assert_array_equal(got_flat[k], exp_flat[k])
