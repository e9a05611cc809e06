"""Checkpoint converters: torch state dicts → flax param trees.

Each converter understands one source family's naming scheme and emits
the param tree of the corresponding emr2a_tpu flax module.  Sources
(capabilities from reference encoders/, not code):

- HF CLIPModel            (clip_encoder.py loads pytorch_model.bin)
- HF ViTModel / timm ViT  (vit_encoder.py, timm naming w/ fused qkv)
- HF BertModel            (BioMedCLIP text tower, PubMedBERT)
- open_clip BiomedCLIP    (open_clip_pytorch_model.bin: visual.trunk.*
                           timm ViT + head, text.transformer.* BERT +
                           text.proj MLP)
- HF DINOv3ViTModel       (see models/dinov3.py)

All functions take ``Dict[str, np.ndarray]``; use
``torch_state_dict_to_numpy`` to strip torch first.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() for k, v in state_dict.items()}


def _dense(sd, name):
    """torch Linear -> flax Dense: kernel = weight.T."""
    out = {"kernel": sd[f"{name}.weight"].T}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _patch_conv_to_dense(weight: np.ndarray, bias=None):
    """torch conv (out, C, p, p) -> Dense kernel (p*p*C, out) matching the
    (ph, pw, c) row-major patch flattening in models/vit.py."""
    out = {"kernel": weight.transpose(2, 3, 1, 0).reshape(-1, weight.shape[0])}
    if bias is not None:
        out["bias"] = bias
    return out


# ---------------------------------------------------------------------------
# HF CLIP
# ---------------------------------------------------------------------------

def _clip_encoder_layers(sd, prefix, num_layers):
    blocks = {}
    for i in range(num_layers):
        p = f"{prefix}encoder.layers.{i}."
        blocks[f"block_{i}"] = {
            "ln1": _ln(sd, p + "layer_norm1"),
            "attn": {
                "q_proj": _dense(sd, p + "self_attn.q_proj"),
                "k_proj": _dense(sd, p + "self_attn.k_proj"),
                "v_proj": _dense(sd, p + "self_attn.v_proj"),
                "out_proj": _dense(sd, p + "self_attn.out_proj"),
            },
            "ln2": _ln(sd, p + "layer_norm2"),
            "mlp": {
                "fc1": _dense(sd, p + "mlp.fc1"),
                "fc2": _dense(sd, p + "mlp.fc2"),
            },
        }
    return blocks


def convert_hf_clip_vision(sd: Dict[str, np.ndarray], num_layers: int,
                           prefix: str = "vision_model.") -> Dict:
    """HF CLIPVisionTransformer -> VisionTransformer params."""
    e = prefix + "embeddings."
    params = {
        "patch_embed": _patch_conv_to_dense(sd[e + "patch_embedding.weight"]),
        "cls_token": sd[e + "class_embedding"].reshape(1, 1, -1),
        "pos_embed": sd[e + "position_embedding.weight"][None],
        # HF's actual attribute is the typo'd "pre_layrnorm".
        "pre_ln": _ln(sd, prefix + ("pre_layrnorm" if prefix + "pre_layrnorm.weight" in sd
                                    else "pre_layernorm")),
        "final_ln": _ln(sd, prefix + "post_layernorm"),
    }
    params.update(_clip_encoder_layers(sd, prefix, num_layers))
    return params


def convert_hf_clip_text(sd: Dict[str, np.ndarray], num_layers: int,
                         prefix: str = "text_model.") -> Dict:
    e = prefix + "embeddings."
    params = {
        "token_embed": {"embedding": sd[e + "token_embedding.weight"]},
        "pos_embed": sd[e + "position_embedding.weight"][None],
        "final_ln": _ln(sd, prefix + "final_layer_norm"),
    }
    params.update(_clip_encoder_layers(sd, prefix, num_layers))
    return params


def convert_hf_clip_image_tower(sd: Dict[str, np.ndarray], num_layers: int) -> Dict:
    return {
        "vision": convert_hf_clip_vision(sd, num_layers),
        "visual_projection": {"kernel": sd["visual_projection.weight"].T},
    }


def convert_hf_clip_text_tower(sd: Dict[str, np.ndarray], num_layers: int) -> Dict:
    return {
        "text": convert_hf_clip_text(sd, num_layers),
        "text_projection": {"kernel": sd["text_projection.weight"].T},
    }


# ---------------------------------------------------------------------------
# HF ViT (ViTModel naming)
# ---------------------------------------------------------------------------

def convert_hf_vit(sd: Dict[str, np.ndarray], num_layers: int,
                   prefix: str = "") -> Dict:
    e = prefix + "embeddings."
    params = {
        "patch_embed": _patch_conv_to_dense(
            sd[e + "patch_embeddings.projection.weight"],
            sd.get(e + "patch_embeddings.projection.bias")),
        "cls_token": sd[e + "cls_token"],
        "pos_embed": sd[e + "position_embeddings"],
        "final_ln": _ln(sd, prefix + "layernorm"),
    }
    for i in range(num_layers):
        p = f"{prefix}encoder.layer.{i}."
        params[f"block_{i}"] = {
            "ln1": _ln(sd, p + "layernorm_before"),
            "attn": {
                "q_proj": _dense(sd, p + "attention.attention.query"),
                "k_proj": _dense(sd, p + "attention.attention.key"),
                "v_proj": _dense(sd, p + "attention.attention.value"),
                "out_proj": _dense(sd, p + "attention.output.dense"),
            },
            "ln2": _ln(sd, p + "layernorm_after"),
            "mlp": {
                "fc1": _dense(sd, p + "intermediate.dense"),
                "fc2": _dense(sd, p + "output.dense"),
            },
        }
    return params


# ---------------------------------------------------------------------------
# timm ViT (fused qkv)
# ---------------------------------------------------------------------------

def convert_timm_vit(sd: Dict[str, np.ndarray], num_layers: int,
                     prefix: str = "") -> Dict:
    params = {
        "patch_embed": _patch_conv_to_dense(
            sd[prefix + "patch_embed.proj.weight"],
            sd.get(prefix + "patch_embed.proj.bias")),
        "cls_token": sd[prefix + "cls_token"],
        "pos_embed": sd[prefix + "pos_embed"],
        # global_pool="avg" checkpoints carry fc_norm (post-pool norm)
        # and an Identity pre-pool norm; token-pool checkpoints carry
        # norm.  Either maps to our final_ln.
        "final_ln": _ln(sd, prefix + ("norm" if prefix + "norm.weight" in sd
                                      else "fc_norm")),
    }
    for i in range(num_layers):
        p = f"{prefix}blocks.{i}."
        qkv_w = sd[p + "attn.qkv.weight"]          # (3h, h)
        h = qkv_w.shape[1]
        qw, kw, vw = qkv_w[:h], qkv_w[h:2 * h], qkv_w[2 * h:]
        qkv_b = sd.get(p + "attn.qkv.bias")
        attn = {
            "q_proj": {"kernel": qw.T},
            "k_proj": {"kernel": kw.T},
            "v_proj": {"kernel": vw.T},
            "out_proj": _dense(sd, p + "attn.proj"),
        }
        if qkv_b is not None:
            attn["q_proj"]["bias"] = qkv_b[:h]
            attn["k_proj"]["bias"] = qkv_b[h:2 * h]
            attn["v_proj"]["bias"] = qkv_b[2 * h:]
        params[f"block_{i}"] = {
            "ln1": _ln(sd, p + "norm1"),
            "attn": attn,
            "ln2": _ln(sd, p + "norm2"),
            "mlp": {
                "fc1": _dense(sd, p + "mlp.fc1"),
                "fc2": _dense(sd, p + "mlp.fc2"),
            },
        }
    return params


# ---------------------------------------------------------------------------
# HF BERT
# ---------------------------------------------------------------------------

def convert_hf_bert(sd: Dict[str, np.ndarray], num_layers: int,
                    prefix: str = "") -> Dict:
    e = prefix + "embeddings."
    params = {
        "token_embed": {"embedding": sd[e + "word_embeddings.weight"]},
        "pos_embed": sd[e + "position_embeddings.weight"][None],
        "type_embed": {"embedding": sd[e + "token_type_embeddings.weight"]},
        "embed_ln": _ln(sd, e + "LayerNorm"),
    }
    for i in range(num_layers):
        p = f"{prefix}encoder.layer.{i}."
        params[f"block_{i}"] = {
            "attn": {
                "q_proj": _dense(sd, p + "attention.self.query"),
                "k_proj": _dense(sd, p + "attention.self.key"),
                "v_proj": _dense(sd, p + "attention.self.value"),
                "out_proj": _dense(sd, p + "attention.output.dense"),
            },
            "attn_ln": _ln(sd, p + "attention.output.LayerNorm"),
            "mlp": {
                "fc1": _dense(sd, p + "intermediate.dense"),
                "fc2": _dense(sd, p + "output.dense"),
            },
            "mlp_ln": _ln(sd, p + "output.LayerNorm"),
        }
    if prefix + "pooler.dense.weight" in sd:
        params["pooler"] = _dense(sd, prefix + "pooler.dense")
    return params


# ---------------------------------------------------------------------------
# open_clip BiomedCLIP (CustomTextCLIP layout)
# ---------------------------------------------------------------------------

def convert_biomedclip_image_tower(sd: Dict[str, np.ndarray],
                                   num_layers: int = 12) -> Dict:
    if "visual.head.proj.weight" in sd:
        # nn.Linear weight: (out, in) -> transpose
        kernel = sd["visual.head.proj.weight"].T
    else:
        # bare open_clip Parameter 'visual.proj' is already (in, out)
        kernel = sd["visual.proj"]
    return {
        "trunk": convert_timm_vit(sd, num_layers, prefix="visual.trunk."),
        "head_proj": {"kernel": kernel},
    }


def convert_biomedclip_text_tower(sd: Dict[str, np.ndarray],
                                  num_layers: int = 12) -> Dict:
    params = {
        "bert": convert_hf_bert(sd, num_layers, prefix="text.transformer."),
    }
    if "text.proj.0.weight" in sd:  # MLP proj (open_clip: bias-free)
        params["proj_fc1"] = {"kernel": sd["text.proj.0.weight"].T}
        params["proj_fc2"] = {"kernel": sd["text.proj.2.weight"].T}
        if "text.proj.0.bias" in sd:
            params["proj_fc1"]["bias"] = sd["text.proj.0.bias"]
            params["proj_fc2"]["bias"] = sd["text.proj.2.bias"]
    elif "text.proj.weight" in sd:
        params["proj"] = {"kernel": sd["text.proj.weight"].T}
    elif "text.proj" in sd:
        params["proj"] = {"kernel": sd["text.proj"]}
    return params


# ---------------------------------------------------------------------------
# torchvision ResNet-18 (CNN baseline backbone)
# ---------------------------------------------------------------------------

def _conv_nhwc(sd, name):
    """torch conv (out, in, kh, kw) -> flax Conv kernel (kh, kw, in, out)."""
    return {"kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0)}


def _bn_split(sd, name):
    """torch BatchNorm -> (flax params, flax batch_stats)."""
    return ({"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]},
            {"mean": sd[f"{name}.running_mean"],
             "var": sd[f"{name}.running_var"]})


def convert_torch_resnet18(sd: Dict[str, np.ndarray],
                           prefix: str = "") -> Dict:
    """torchvision ``resnet18`` state dict -> variables for
    models/resnet.ResNet18 (backbone only — ``fc.*`` is dropped; the
    baseline heads train from scratch like the reference's replaced fc,
    /root/reference/baselines/cnn_baseline/train_cnn_baseline.py:137-141).

    Returns {"params": ..., "batch_stats": ...}.
    """
    params: Dict = {}
    stats: Dict = {}
    params["stem_conv"] = _conv_nhwc(sd, prefix + "conv1")
    params["stem_bn"], stats["stem_bn"] = _bn_split(sd, prefix + "bn1")
    for stage, n_blocks in enumerate((2, 2, 2, 2)):
        for block in range(n_blocks):
            t = f"{prefix}layer{stage + 1}.{block}."
            bp: Dict = {}
            bs: Dict = {}
            bp["conv1"] = _conv_nhwc(sd, t + "conv1")
            bp["bn1"], bs["bn1"] = _bn_split(sd, t + "bn1")
            bp["conv2"] = _conv_nhwc(sd, t + "conv2")
            bp["bn2"], bs["bn2"] = _bn_split(sd, t + "bn2")
            if t + "downsample.0.weight" in sd:
                bp["downsample_conv"] = _conv_nhwc(sd, t + "downsample.0")
                bp["downsample_bn"], bs["downsample_bn"] = _bn_split(
                    sd, t + "downsample.1")
            name = f"stage{stage}_block{block}"
            params[name] = bp
            stats[name] = bs
    return {"params": params, "batch_stats": stats}
