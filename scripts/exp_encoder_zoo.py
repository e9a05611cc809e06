"""Per-encoder embedding throughput at real geometry, real chip.

Round-2 verdict #4: the headline bench covers BioMedCLIP ViT-B/16 only;
the zoo's other production geometries need their own rows.  Measures
slices/s (device path: fused preprocess + tower + projection + L2 norm,
scan-chained like bench.py) for:

- biomedclip: ViT-B/16 @ 224 (the bench.py headline, for scale)
- clip_l336:  CLIP ViT-L/14 @ 336 (reference encoders/clip_encoder.py:
  25-36 default openai/clip-vit-large-patch14-336)
- dinov3_l16: DINOv3 ViT-L/16 @ 224 (reference encoders/dino_encoder.py:
  27-35 default facebook/dinov3-vitl16-pretrain-lvd1689m; RoPE +
  registers + LayerScale blocks)

Each at bf16 and, where the tower has a quantized path, W8A8
(quantize_params_tree).  Methodology: >= N_BATCHES scan-chained batches
inside ONE jit, single scalar readback, relay RTT subtracted, best of 3.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _t(f):
    t0 = time.time()
    f()
    return time.time() - t0


def _rtt():
    @jax.jit
    def empty(x):
        return x + 1.0
    float(empty(jnp.float32(0)))
    return min(_t(lambda: float(empty(jnp.float32(i)))) for i in range(1, 4))


def measure_tower(fwd, params, batches, rtt, n_runs=3):
    @jax.jit
    def chain(params, batches):
        def body(carry, images_u8):
            feats = fwd(params, images_u8)
            return carry + feats.astype(jnp.float32).sum(), None
        total, _ = jax.lax.scan(body, jnp.float32(0), batches)
        return total

    t0 = time.time()
    float(chain(params, batches))
    print(f"  compile+run: {time.time()-t0:.1f}s", flush=True)
    dt = min(_t(lambda: float(chain(params, batches)))
             for _ in range(n_runs))
    return max(dt - rtt, 1e-9)


def build_biomedclip(precision):
    from emr2a_tpu.encoders.biomedclip_encoder import (
        default_biomedclip_config)
    from emr2a_tpu.models.clip import BioMedCLIPImageTower
    from emr2a_tpu.models.vit import ViTConfig
    from emr2a_tpu.ops.preprocess import (BIOMEDCLIP_PREPROCESS,
                                          preprocess_images)

    base = default_biomedclip_config()
    vcfg = ViTConfig(**{**base.vision.__dict__, "dtype": jnp.bfloat16,
                        "fused_mlp": True, "fused_attn": True})
    config = type(base)(vision=vcfg, text=base.text,
                        projection_dim=base.projection_dim,
                        text_proj=base.text_proj)
    tower = BioMedCLIPImageTower(config)
    params = tower.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 3)))["params"]
    params = _finalize(params, precision)

    def fwd(p, images_u8):
        pixels = preprocess_images(images_u8, BIOMEDCLIP_PREPROCESS)
        feats = tower.apply({"params": p}, pixels.astype(jnp.bfloat16))
        return _l2(feats)

    return fwd, params, 224


def build_clip_l336(precision):
    import dataclasses

    from emr2a_tpu.models.clip import CLIPConfig, CLIPImageTower
    from emr2a_tpu.models.vit import CLIP_VIT_L14_336_VISION, ViTConfig
    from emr2a_tpu.ops.preprocess import CLIP_PREPROCESS, preprocess_images

    vcfg = ViTConfig(**{**CLIP_VIT_L14_336_VISION.__dict__,
                        "dtype": jnp.bfloat16, "fused_mlp": True,
                        "fused_attn": True})
    config = CLIPConfig(vision=vcfg, text=None, projection_dim=768)
    tower = CLIPImageTower(config)
    params = tower.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 336, 336, 3)))["params"]
    params = _finalize(params, precision)
    spec = dataclasses.replace(CLIP_PREPROCESS, resize_size=336,
                               crop_size=336)

    def fwd(p, images_u8):
        pixels = preprocess_images(images_u8, spec)
        feats = tower.apply({"params": p}, pixels.astype(jnp.bfloat16))
        return _l2(feats)

    return fwd, params, 336


def build_dinov3_l16(precision):
    import dataclasses

    from emr2a_tpu.models.dinov3 import DINOV3_VITL16, DINOv3ViT
    from emr2a_tpu.ops.preprocess import DINOV3_PREPROCESS, preprocess_images

    cfg = dataclasses.replace(DINOV3_VITL16, dtype=jnp.bfloat16)
    tower = DINOv3ViT(cfg, pooling="mean_all")
    params = tower.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 3)))["params"]
    params = _finalize(params, precision)

    def fwd(p, images_u8):
        pixels = preprocess_images(images_u8, DINOV3_PREPROCESS)
        # DINO embeddings ship un-normalized (reference parity)
        return tower.apply({"params": p}, pixels.astype(jnp.bfloat16))

    return fwd, params, 224


def build_qwen3vl_vtap(precision, depth=None):
    """Qwen3-VL vision-tap ENCODER mode (the flagship judge used as an
    embedder): last-3 vision-block outputs, mean-pooled per layer,
    averaged across layers — the hook semantics of
    /root/reference/encoders/qwen3_vl_8b_thinking_encoder.py:83-150
    (2B and 8B share the 1152-wide depth-27/24 tower; this measures the
    8B geometry, the deeper of the two).  448x448 input -> grid
    (1, 28, 28) = 784 patches.  Device path: uint8 -> normalize ->
    patchify -> tower taps; the patch ORDER differs from the HF
    processor's merge-block interleave, which is perf-irrelevant for
    throughput (identical shapes/FLOPs; the production encoder uses
    the HF processor on host)."""
    from scripts.exp_qwen_generate import build_config
    from emr2a_tpu.models.qwen3_vl import QwenVisionTower
    from emr2a_tpu.ops.preprocess import CLIP_PREPROCESS, preprocess_images
    import dataclasses

    vcfg = build_config("8b").vision
    if depth:
        vcfg = dataclasses.replace(vcfg, depth=depth,
                                   deepstack_visual_indexes=(0,))
    tower = QwenVisionTower(vcfg)
    size = 448
    g = size // vcfg.patch_size
    grid = ((1, g, g),)
    taps = tuple(range(vcfg.depth - 3, vcfg.depth))
    patch_dim = (vcfg.temporal_patch_size * vcfg.patch_size ** 2 * 3)
    params = tower.init(jax.random.PRNGKey(0),
                        jnp.zeros((g * g, patch_dim), jnp.bfloat16),
                        grid)["params"]
    params = _finalize(params, precision)
    spec = dataclasses.replace(CLIP_PREPROCESS, resize_size=size,
                               crop_size=size)

    def fwd(p, images_u8):
        x = preprocess_images(images_u8, spec).astype(jnp.bfloat16)
        B = x.shape[0]
        # (B, H, W, 3) -> (B, g*g, patch*patch*3), temporal frame
        # duplicated (single images repeat their frame, HF processor
        # behavior)
        x = x.reshape(B, g, vcfg.patch_size, g, vcfg.patch_size, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, -1)
        x = jnp.concatenate([x, x], axis=-1)  # temporal_patch_size=2

        # Batch through the tower's NATIVE multi-frame path (one flat
        # patch sequence, B grid entries -> frame-batched attention).
        # Measured: 121.7 slices/s at B=8 with the batched einsum
        # chain (each block materializes (8, 16, 784, 784) f32 logits
        # = 315 MB; the logits+probs HBM round-trip ~= the whole
        # 65.7 ms forward); 163.8 slices/s after the round-5 scan
        # lowering (lax.map per frame keeps one frame's 39 MB logits
        # inside XLA's fusion window — PERF_NOTES "attention-lowering
        # shootout").  B=1 (184.3, flat path, always fused) remains
        # the encoder-mode recommendation.
        _, _, tap_outs = tower.apply({"params": p}, x.reshape(B * g * g, -1),
                                     grid * B, tap_layers=taps)
        per_img = [t.reshape(B, g * g, -1).mean(axis=1) for t in tap_outs]
        return jnp.stack(per_img).mean(0)

    return fwd, params, size


def _l2(feats):
    feats = feats.astype(jnp.float32)
    return feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)


def _finalize(params, precision):
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    if precision == "int8":
        from emr2a_tpu.models.quantize import quantize_params_tree
        params = quantize_params_tree(jax.device_get(params))
    return jax.device_put(params)


ZOO = {
    "biomedclip": (build_biomedclip, 128, ("bf16", "int8")),
    "clip_l336": (build_clip_l336, 32, ("bf16", "int8")),
    "dinov3_l16": (build_dinov3_l16, 64, ("bf16", "int8")),
    # B=1 = the reference's per-image hook protocol; B=8 = the TPU-
    # batched mode (vmapped tower)
    "qwen3vl_vtap_b1": (build_qwen3vl_vtap, 1, ("bf16",)),
    "qwen3vl_vtap_b8": (build_qwen3vl_vtap, 8, ("bf16",)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoders", default="clip_l336,dinov3_l16",
                    help=f"comma list from {sorted(ZOO)}")
    ap.add_argument("--precision", default=None,
                    help="override precision list (comma)")
    ap.add_argument("--n_batches", type=int, default=21)
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()

    rtt = _rtt()
    records = []
    rng = np.random.RandomState(0)
    for name in args.encoders.split(","):
        builder, batch, precisions = ZOO[name]
        if args.precision:
            precisions = args.precision.split(",")
        for precision in precisions:
            print(f"== {name} {precision} (batch {batch}) ==", flush=True)
            fwd, params, size = builder(precision)
            batches = jax.device_put(rng.randint(
                0, 256, (args.n_batches, batch, size, size, 3), np.uint8))
            dt = measure_tower(fwd, params, batches, rtt)
            rate = args.n_batches * batch / dt
            rec = {"metric": f"{name}_embed_throughput",
                   "value": round(rate, 1), "unit": "slices/sec/chip",
                   "precision": precision, "batch": batch}
            records.append(rec)
            print(json.dumps(rec), flush=True)
            if args.json_out:  # flush per row — a later-tower crash
                # must not lose completed measurements
                with open(args.json_out, "a", encoding="utf-8") as f:
                    f.write(json.dumps(rec) + "\n")
            del params, batches


if __name__ == "__main__":
    main()
