"""ViT image encoder (timm vit_base_patch16_224-style).

Capability parity: encoders/vit_encoder.py (timm ViT num_classes=0
global_pool="avg" :28-33; optional checkpoint with key-prefix cleaning
:35-47; image-only — text raises NotImplementedError :75-82; features
NOT L2-normalized, matching the reference).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import jax
import numpy as np

from emr2a_tpu.encoders.jit_encoder import JitImageTextEncoder
from emr2a_tpu.models.checkpoint import load_state_dict
from emr2a_tpu.models.convert import convert_timm_vit
from emr2a_tpu.models.vit import TIMM_VIT_B16, ViTConfig, VisionTransformer
from emr2a_tpu.ops.preprocess import TIMM_VIT_PREPROCESS


def clean_checkpoint_keys(sd: dict) -> dict:
    """Strip common wrapper prefixes (module./model./state_dict nesting),
    the same normalization the reference applies (vit_encoder.py:35-47)."""
    out = {}
    for k, v in sd.items():
        for prefix in ("module.", "model."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        out[k] = v
    return out


class ViTEncoder(JitImageTextEncoder):

    def __init__(self, model_name: str = "vit_base_patch16_224",
                 model_path: Optional[str] = None, device: str = "tpu",
                 config: Optional[ViTConfig] = None, params=None,
                 max_batch: int = 256, fast: bool = False, mesh=None):
        self.model_name = model_name
        if config is None:
            config = TIMM_VIT_B16
        if fast:
            # bf16 + fused Pallas kernels; inference-only, TPU-only
            # (see encoders/biomedclip_encoder._fast_config)
            import dataclasses
            import jax.numpy as jnp
            config = dataclasses.replace(config, dtype=jnp.bfloat16,
                                         fused_mlp=True, fused_attn=True)
        self.config = config
        self._tower = VisionTransformer(config)
        if model_path is not None:
            sd = clean_checkpoint_keys(load_state_dict(Path(model_path)))
            params = convert_timm_vit(sd, config.num_layers)
        if params is None:
            params = self._tower.init(
                jax.random.PRNGKey(0),
                np.zeros((1, config.image_size, config.image_size, 3),
                         np.float32))["params"]
        if fast:
            import jax.numpy as jnp
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
            if fast == "int8":
                from emr2a_tpu.models.quantize import quantize_params_tree
                params = quantize_params_tree(params)

        def image_apply(p, pixels):
            return self._tower.apply({"params": p}, pixels)

        # timm crop_pct=0.9 geometry scaled to the configured size
        # (floor(size/0.9): 224 -> resize 248, crop 224).
        from emr2a_tpu.ops.preprocess import PreprocessSpec
        if config.image_size == 224:
            spec = TIMM_VIT_PREPROCESS
        else:
            spec = PreprocessSpec(
                resize_size=int(config.image_size / 0.9),
                crop_size=config.image_size,
                mean=TIMM_VIT_PREPROCESS.mean, std=TIMM_VIT_PREPROCESS.std)

        super().__init__(
            params=params, image_apply=image_apply, text_apply=None,
            tokenize=None, preprocess=spec,
            normalize=False,  # reference ViT features are un-normalized
            max_batch=max_batch, device=device, mesh=mesh)

    def encode_batch_texts(self, texts: List[str]):
        raise NotImplementedError("ViT encoder does not support text encoding")

    def encode_text(self, text: str):
        raise NotImplementedError("ViT encoder does not support text encoding")
