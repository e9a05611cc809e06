"""Flexible Vision Transformer covering the encoder zoo's image towers.

One module, configured per family (reference encoders in
/root/reference/encoders/):

- HF CLIP vision tower (clip_encoder.py:52-64): cls token, learned pos
  embeddings, pre-encoder LayerNorm, quick_gelu, conv patch embed
  without bias, post-LN applied to the cls token ("pooler").
- HF/timm ViT-B/16 (vit_encoder.py:28-33, timm num_classes=0
  global_pool="avg"): cls token, biased patch conv, gelu, mean pooling
  over patch tokens.
- BioMedCLIP image tower (biomedclip_encoder.py:26): timm ViT-B/16
  inside open_clip, pooled then linearly projected to the CLIP space.

DINOv3 (RoPE + LayerScale) differs enough to live in models/dinov3.py.

Patchify-as-matmul: the conv patch embed is expressed as a reshape to
(B, n_patches, p*p*3) followed by a Dense — one big MXU matmul fed
directly by the preprocessed image, rather than a convolution.  This is
the "preprocessing fused into the first matmul" design from
BASELINE.json: normalize → patchify → embed is a single fused XLA
region with no intermediate HBM round trip.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import linen as nn

from emr2a_tpu.models.layers import TransformerBlock


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    activation: str = "gelu"
    ln_eps: float = 1e-5          # HF ViT uses 1e-12, CLIP 1e-5
    use_cls_token: bool = True
    use_pre_layernorm: bool = False   # CLIP vision: True
    patch_bias: bool = True           # CLIP vision: False
    pooling: str = "mean"             # "cls_ln" (CLIP) | "mean" | "cls" | "none"
    dtype: jnp.dtype = jnp.float32
    fused_mlp: bool = False           # Pallas LN+MLP+residual kernel (TPU)
    fused_attn: bool = False          # Pallas LN+attention+residual kernel

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


# Preset configs for the zoo.
CLIP_VIT_B16_VISION = ViTConfig(
    activation="quick_gelu", use_pre_layernorm=True, patch_bias=False,
    pooling="cls_ln", ln_eps=1e-5)
CLIP_VIT_L14_336_VISION = ViTConfig(
    image_size=336, patch_size=14, hidden_size=1024, num_layers=24,
    num_heads=16, mlp_dim=4096, activation="quick_gelu",
    use_pre_layernorm=True, patch_bias=False, pooling="cls_ln", ln_eps=1e-5)
HF_VIT_B16 = ViTConfig(ln_eps=1e-12, pooling="mean")
# timm global_pool="avg" uses fc_norm AFTER pooling (pre-pool norm is
# Identity) — a different embedding than LN-then-mean.
TIMM_VIT_B16 = ViTConfig(ln_eps=1e-6, pooling="avg_fc_norm")
BIOMEDCLIP_VIT_B16 = ViTConfig(ln_eps=1e-6, pooling="cls")


class VisionTransformer(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels: (B, H, W, 3) preprocessed (normalized) images.

        Returns pooled features (B, hidden) — or (B, S, hidden) with
        pooling="none".
        """
        cfg = self.config
        B, H, W, C = pixels.shape
        p = cfg.patch_size
        gh, gw = H // p, W // p

        # Patchify-as-matmul: (B,H,W,C) -> (B, gh*gw, p*p*C) -> Dense.
        # Row-major within a patch matches conv weight layout after the
        # converter's corresponding reshape/transpose.
        x = pixels.reshape(B, gh, p, gw, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, p * p * C)
        x = nn.Dense(cfg.hidden_size, use_bias=cfg.patch_bias,
                     dtype=cfg.dtype, name="patch_embed")(x)

        seq = x.shape[1]
        if cfg.use_cls_token:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, cfg.hidden_size))
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (B, 1, cfg.hidden_size)).astype(x.dtype), x],
                axis=1)
            seq += 1

        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, seq, cfg.hidden_size))
        x = x + pos.astype(x.dtype)

        if cfg.use_pre_layernorm:
            x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype,
                             name="pre_ln")(x)

        # Fast path: pad the token axis to sublane (8) alignment ONCE
        # and keep it padded through every block — the fused attention
        # kernel masks pad keys via valid_len, the fused MLP is
        # row-wise, and pooling below slices the padding away.  This
        # removes the per-layer XLA pad/slice copies the lane-padded
        # kernel I/O used to require (~4% of tower time at ViT-B).
        valid_len = None
        if cfg.fused_attn and seq % 8:
            valid_len = seq
            x = jnp.pad(x, [(0, 0), (0, (-seq) % 8), (0, 0)])

        for i in range(cfg.num_layers):
            x = TransformerBlock(
                num_heads=cfg.num_heads, mlp_dim=cfg.mlp_dim,
                activation=cfg.activation, ln_eps=cfg.ln_eps,
                dtype=cfg.dtype, fused_mlp=cfg.fused_mlp,
                fused_attn=cfg.fused_attn, valid_len=valid_len,
                name=f"block_{i}")(x)

        if valid_len is not None:
            x = x[:, :valid_len]

        ln = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype, name="final_ln")

        if cfg.pooling in ("cls_ln", "cls"):
            # post-LN then cls token (HF CLIP pooler / timm token
            # pooling).  LN is row-wise, so normalizing only the cls row
            # is exact and skips S-1 tokens' worth of LN work.
            return ln(x[:, 0])
        if cfg.pooling == "mean":
            # HF ViTModel convention: LN over tokens, then mean of patches.
            x = ln(x)
            start = 1 if cfg.use_cls_token else 0
            return x[:, start:].mean(axis=1)
        if cfg.pooling == "avg_fc_norm":
            # timm global_pool="avg": mean of patch tokens FIRST, then
            # fc_norm (the pre-pool norm is Identity in that config).
            start = 1 if cfg.use_cls_token else 0
            return ln(x[:, start:].mean(axis=1))
        if cfg.pooling == "none":
            return ln(x)
        raise ValueError(f"unknown pooling {cfg.pooling}")
