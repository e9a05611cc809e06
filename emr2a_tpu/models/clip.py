"""Dual-tower CLIP-style models: CLIP and BioMedCLIP.

Capability parity targets (reference):
- encoders/clip_encoder.py — HF CLIPModel: vision pooled → visual
  projection → L2; text pooled (EOT) → text projection → L2.
- encoders/biomedclip_encoder.py — open_clip BiomedCLIP: timm ViT-B/16
  cls-pooled → linear head; PubMedBERT cls-pooled → MLP proj; L2 both.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import linen as nn

from emr2a_tpu.models.text import BertConfig, BertEncoder, CLIPTextConfig, CLIPTextTransformer
from emr2a_tpu.models.vit import ViTConfig, VisionTransformer


@dataclass(frozen=True)
class CLIPConfig:
    vision: ViTConfig
    text: CLIPTextConfig
    projection_dim: int = 512


class CLIPImageTower(nn.Module):
    """Vision tower + projection; returns unnormalized embeddings
    (callers L2-normalize, matching clip_encoder.py:60-63)."""

    config: CLIPConfig

    @nn.compact
    def __call__(self, pixels):
        pooled = VisionTransformer(self.config.vision, name="vision")(pixels)
        return nn.Dense(self.config.projection_dim, use_bias=False,
                        name="visual_projection")(pooled)


class CLIPTextTower(nn.Module):
    config: CLIPConfig

    @nn.compact
    def __call__(self, input_ids):
        pooled = CLIPTextTransformer(self.config.text, name="text")(input_ids)
        return nn.Dense(self.config.projection_dim, use_bias=False,
                        name="text_projection")(pooled)


@dataclass(frozen=True)
class BioMedCLIPConfig:
    vision: ViTConfig
    text: BertConfig
    projection_dim: int = 512
    # open_clip HFTextEncoder proj="mlp": hidden = (d_model + proj) // 2
    text_proj: str = "mlp"


class BioMedCLIPImageTower(nn.Module):
    config: BioMedCLIPConfig

    @nn.compact
    def __call__(self, pixels):
        pooled = VisionTransformer(self.config.vision, name="trunk")(pixels)
        return nn.Dense(self.config.projection_dim, use_bias=False,
                        name="head_proj")(pooled)


class BioMedCLIPTextTower(nn.Module):
    config: BioMedCLIPConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        pooled = BertEncoder(self.config.text, pooling="cls",
                             name="bert")(input_ids, attention_mask)
        if self.config.text_proj == "mlp":
            # open_clip HFTextEncoder proj="mlp" builds bias-free Linears
            d = self.config.text.hidden_size
            hidden = (d + self.config.projection_dim) // 2
            h = nn.Dense(hidden, use_bias=False, name="proj_fc1")(pooled)
            h = jnp.asarray(
                nn.gelu(h, approximate=False), pooled.dtype)
            return nn.Dense(self.config.projection_dim, use_bias=False,
                            name="proj_fc2")(h)
        return nn.Dense(self.config.projection_dim, use_bias=False,
                        name="proj")(pooled)
