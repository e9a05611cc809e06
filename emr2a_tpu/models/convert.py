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


# ---------------------------------------------------------------------------
# Checkpoint bring-up CLI
# ---------------------------------------------------------------------------

def bringup_qwen3_vl(model_path, max_new_tokens: int = 32,
                     tokenizer=None, image_size: int = 128,
                     cache_params: bool = True) -> Dict:
    """Prove a real Qwen3-VL HF checkpoint end-to-end on this stack:
    load (sharded) safetensors -> convert (Orbax-cached) -> one
    encoder-tap forward + a text embedding -> short greedy generation,
    asserting finiteness and a tokenizer round-trip at each step.

    The reference brings the model up through HF from_pretrained
    (/root/reference/encoders/qwen3_vl_8b_thinking_encoder.py:30-43);
    this is the equivalent smoke for the JAX path.  Returns a summary
    dict (also printed by the CLI).
    """
    import time

    from emr2a_tpu.encoders.qwen3_vl_encoder import Qwen3VLEncoder
    from emr2a_tpu.judge.qwen_backend import QwenVLBackend

    t0 = time.time()
    backend = QwenVLBackend(str(model_path), tokenizer=tokenizer,
                            cache_params=cache_params)
    load_s = time.time() - t0
    summary: Dict = {"model_path": str(model_path),
                     "load_convert_s": round(load_s, 1)}

    # encoder taps (hook semantics) on a synthetic CT-like slice
    rng = np.random.RandomState(0)
    img = (rng.rand(image_size, image_size, 3) * 255).astype(np.uint8)
    enc = Qwen3VLEncoder(config=backend.config,
                         params=backend.generator.params,
                         tokenizer=backend.tokenizer,
                         image_processor=backend.image_processor)
    t0 = time.time()
    emb = enc.encode_batch_images([img])[0]
    if emb is None or not np.isfinite(emb).all():
        raise AssertionError("vision tap embedding is missing/non-finite")
    summary["image_tap_dim"] = int(emb.shape[0])
    summary["image_tap_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    txt_emb = enc.encode_batch_texts(["性别: 男; 年龄: 63; 发热: 有"])[0]
    if txt_emb is None or not np.isfinite(txt_emb).all():
        raise AssertionError("text embedding is missing/non-finite")
    summary["text_dim"] = int(txt_emb.shape[0])
    summary["text_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    out = backend.generate([img], "Describe this CT slice briefly.",
                           max_new_tokens=max_new_tokens, temperature=0.0)
    summary["generate_s"] = round(time.time() - t0, 1)
    summary["generated"] = out[:200]
    if not isinstance(out, str):
        raise AssertionError("generation did not return text")

    # tokenizer round-trip: decode(encode(text)) preserves the text.
    # Strict containment — "decoded something non-empty" would pass for
    # a tokenizer with the wrong vocab/merges, which is exactly the
    # breakage this smoke exists to catch.  Hard-fail only for the
    # checkpoint's own tokenizer; an injected test tokenizer (e.g. the
    # non-reversible toy) gets the honest False in the summary.
    probe = "CT slice audit."
    ids = backend.tokenizer(probe, add_special_tokens=False)["input_ids"]
    rt = backend.tokenizer.decode(ids, skip_special_tokens=True)
    summary["tokenizer_roundtrip_ok"] = bool(probe.strip() in rt)
    if tokenizer is None and not summary["tokenizer_roundtrip_ok"]:
        raise AssertionError(f"tokenizer round-trip failed: {rt!r}")
    return summary


def _main(argv=None) -> None:
    import argparse
    import json as _json

    ap = argparse.ArgumentParser(
        description="Checkpoint conversion bring-up checks")
    ap.add_argument("--qwen3-vl", dest="qwen3_vl", default=None,
                    help="HF Qwen3-VL checkpoint dir: convert + tap "
                         "forward + short greedy generation")
    ap.add_argument("--max-new-tokens", type=int, default=32)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--no-cache", action="store_true",
                    help="skip the Orbax converted-params cache")
    args = ap.parse_args(argv)
    if args.qwen3_vl:
        summary = bringup_qwen3_vl(args.qwen3_vl,
                                   max_new_tokens=args.max_new_tokens,
                                   image_size=args.image_size,
                                   cache_params=not args.no_cache)
        print(_json.dumps(summary, ensure_ascii=False))
    else:
        ap.error("nothing to do: pass --qwen3-vl <dir>")


if __name__ == "__main__":
    _main()
