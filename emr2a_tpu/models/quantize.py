"""Post-load W8A8 quantization of transformer tower params.

``quantize_tower_params`` walks a VisionTransformer param tree and
replaces each TransformerBlock's projection / MLP kernels with int8
weights + per-output-column f32 scales (ops/mlp.quantize_weight_int8).
TransformerBlock detects the ``kernel_q`` entries at apply time and
routes through the W8A8 Pallas kernels
(ops/attention_block.fused_ln_attention_int8, ops/mlp.fused_ln_mlp_int8):
s8 x s8 -> s32 MXU products run ~2x the bf16 rate on v5e
(scripts/exp_roofline.py --what int8) and the tower is MXU-pass-bound.

Embedding quality: per-layer row cosine vs the bf16 path >= 0.9999 at
ViT-B scales; the full-tower cosine is asserted by
tests/test_quantized_tower.py.  Inference-only (no VJP), TPU-first
(interpret mode off-TPU).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from emr2a_tpu.ops.mlp import quantize_weight_int8

_ATTN_PROJS = ("q_proj", "k_proj", "v_proj", "out_proj",
               "o_proj")                                    # DINOv3 naming
_MLP_FCS = ("fc1", "fc2",
            "gate_proj", "up_proj", "down_proj")            # DINOv3 naming


def _quantize_dense(entry: Dict) -> Dict:
    w = np.asarray(entry["kernel"], np.float32)
    q, scale = quantize_weight_int8(w)
    out = {k: v for k, v in entry.items() if k != "kernel"}
    out["kernel_q"] = q
    out["kernel_scale"] = scale.reshape(-1)
    return out


def quantize_block_params(block: Dict) -> Dict:
    """One TransformerBlock subtree -> W8A8 subtree."""
    out = dict(block)
    if "attn" in block:
        attn = dict(block["attn"])
        for proj in _ATTN_PROJS:
            if proj in attn and "kernel" in attn[proj]:
                attn[proj] = _quantize_dense(attn[proj])
        out["attn"] = attn
    if "mlp" in block:
        mlp = dict(block["mlp"])
        for fc in _MLP_FCS:
            if fc in mlp and "kernel" in mlp[fc]:
                mlp[fc] = _quantize_dense(mlp[fc])
        out["mlp"] = mlp
    return out


def quantize_tower_params(params: Dict) -> Dict:
    """VisionTransformer params -> params with every block_i quantized.

    Non-block entries (patch_embed, pos_embed, layernorms, projection)
    pass through untouched — they are a rounding error of the FLOPs and
    stay in the float path.
    """
    return {name: (quantize_block_params(sub)
                   if name.startswith("block_") else sub)
            for name, sub in params.items()}


def quantize_params_tree(params):
    """Recursively find TransformerBlock levels anywhere in a param
    tree (any dict level containing a ``block_0`` key) and quantize
    them; everything else passes through.  Lets every ViT-family
    encoder (CLIP/BioMedCLIP/timm ViT) share one entry point whatever
    its tower nesting."""
    if not isinstance(params, dict):
        return params
    if any(k.startswith("block_") for k in params):
        return quantize_tower_params(params)
    return {k: quantize_params_tree(v) for k, v in params.items()}


_QWEN_PROJS = ("q_proj", "k_proj", "v_proj", "o_proj",
               "gate_proj", "up_proj", "down_proj")


def _int4_group(K: int, target: int = 128) -> int:
    """Largest even divisor of K <= target (tiny test geometries are
    not 128-divisible; real geometries always take the full 128)."""
    for g in range(min(target, K), 1, -1):
        if K % g == 0 and g % 2 == 0:
            return g
    raise ValueError(f"no even group divides K={K}")


def _quantize_dense_int4(entry: Dict) -> Dict:
    from emr2a_tpu.ops.linear_int4 import quantize_weight_int4
    w = np.asarray(entry["kernel"], np.float32)
    packed, scale = quantize_weight_int4(w, group=_int4_group(w.shape[0]))
    out = {k: v for k, v in entry.items() if k != "kernel"}
    out["kernel_p4"] = packed
    out["kernel_scale4"] = scale
    return out


def _fuse_entries(layer: Dict, names) -> Dict:
    """Concatenate projection kernels (and biases, if any) along the
    output axis into one entry — one streaming-kernel dispatch and one
    activation quantize instead of len(names).  Column scales are
    per-output-column, so quantizing the concatenated kernel is
    numerically identical to quantizing the parts."""
    kernel = np.concatenate(
        [np.asarray(layer[n]["kernel"], np.float32) for n in names], axis=1)
    entry = {"kernel": kernel}
    if all("bias" in layer[n] for n in names):
        entry["bias"] = np.concatenate(
            [np.asarray(layer[n]["bias"], np.float32) for n in names])
    return entry


def quantize_qwen_text_params(params: Dict,
                              lm_head_int8: bool = False,
                              precision: str = "int8",
                              fuse_projs: bool = False) -> Dict:
    """Qwen text-model params -> W8A8 (or W4A8) decoder layers.

    Quantizes the seven projections of every ``layer_i``
    (models/qwen3_vl.QwenTextDecoderLayer routes on the ``kernel_q`` /
    ``kernel_p4`` entries via ops/linear_int8 / ops/linear_int4).
    ``precision="int4"`` uses group-128 4-bit weights — decode is
    weight-bandwidth-bound, so W4 roughly halves ms/token again over
    W8.  Embedding table / tied lm_head and norms stay bf16 — the
    embedding doubles as the lookup table.
    An untied lm_head (8B geometry) stays bf16 by default: measured at
    8B, W8 lm_head trades -24 ms prefill for +1.5 ms/token decode
    (grid-step overhead at M=1 matvec shape beats the byte saving), and
    audit serving is decode-heavy — pass ``lm_head_int8=True`` for
    prefill-heavy workloads.  Serving-only (no VJP).
    """
    if precision not in ("int8", "int4"):
        raise ValueError(f"precision must be int8|int4, got {precision!r}")
    quant = _quantize_dense if precision == "int8" else _quantize_dense_int4

    def one_layer(layer: Dict) -> Dict:
        out = dict(layer)
        # ``fuse_projs``: merge q/k/v and gate/up into single entries
        # (QwenTextDecoderLayer routes on qkv_proj / gate_up_proj) —
        # fewer kernel dispatches per layer and one activation quantize
        # per fused group.  Serving-only, single-chip layout (TP
        # shardings name the unfused projs).  Members of a fused group
        # are quantized once, as the concatenation (column scales are
        # per-output-column, so the result is identical).
        fused = set()
        if fuse_projs:
            qkv = ("q_proj", "k_proj", "v_proj")
            if all(p in layer and "kernel" in layer[p] for p in qkv):
                out["qkv_proj"] = quant(_fuse_entries(layer, qkv))
                fused.update(qkv)
            gu = ("gate_proj", "up_proj")
            if all(p in layer and "kernel" in layer[p] for p in gu):
                out["gate_up_proj"] = quant(_fuse_entries(layer, gu))
                fused.update(gu)
            for p in fused:
                del out[p]
        for proj in _QWEN_PROJS:
            if proj not in fused and proj in layer and "kernel" in layer[proj]:
                out[proj] = quant(layer[proj])
        return out

    out = {name: (one_layer(sub) if name.startswith("layer_") else sub)
           for name, sub in params.items()}
    if lm_head_int8 and "lm_head" in out and "kernel" in out["lm_head"]:
        out["lm_head"] = _quantize_dense(out["lm_head"])
    return out
