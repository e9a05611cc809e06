"""DINOv3 image encoder.

Capability parity: encoders/dino_encoder.py (HF facebook/dinov3-vitl16;
mean over all last_hidden_state tokens then L2 norm :52-57; text
returns None :62-64; true batched image path :66-80).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import List, Optional

import jax
import numpy as np

from emr2a_tpu.encoders.jit_encoder import JitImageTextEncoder
from emr2a_tpu.models.checkpoint import load_state_dict
from emr2a_tpu.models.dinov3 import (
    DINOV3_VITL16,
    DINOv3Config,
    DINOv3ViT,
    convert_hf_dinov3,
)
from emr2a_tpu.ops.preprocess import DINOV3_PREPROCESS


def dinov3_config_from_hf(cfg: dict) -> DINOv3Config:
    return DINOv3Config(
        image_size=cfg.get("image_size", 224),
        patch_size=cfg.get("patch_size", 16),
        hidden_size=cfg.get("hidden_size", 1024),
        num_layers=cfg.get("num_hidden_layers", 24),
        num_heads=cfg.get("num_attention_heads", 16),
        mlp_dim=cfg.get("intermediate_size", 4096),
        activation=cfg.get("hidden_act", "gelu"),
        ln_eps=cfg.get("layer_norm_eps", 1e-5),
        num_register_tokens=cfg.get("num_register_tokens", 0),
        rope_theta=cfg.get("rope_theta", 100.0),
        use_gated_mlp=cfg.get("use_gated_mlp", False),
        query_bias=cfg.get("query_bias", True),
        key_bias=cfg.get("key_bias", False),
        value_bias=cfg.get("value_bias", True),
        proj_bias=cfg.get("proj_bias", True),
        mlp_bias=cfg.get("mlp_bias", True))


logger = logging.getLogger(__name__)

class DINOEncoder(JitImageTextEncoder):

    def __init__(self, model_path: Optional[str] = None, device: str = "tpu",
                 config: Optional[DINOv3Config] = None, params=None,
                 max_batch: int = 128, fast: bool = False, mesh=None):
        if model_path is not None:
            mp = Path(model_path)
            cfg_file = mp / "config.json"
            if cfg_file.exists():
                with cfg_file.open() as f:
                    config = dinov3_config_from_hf(json.load(f))
            sd = load_state_dict(mp)
            config = config or DINOV3_VITL16
            params = convert_hf_dinov3(sd, config.num_layers)
        if config is None:
            config = DINOV3_VITL16
        if fast:
            # bf16 params/compute; DINOv3's RoPE+LayerScale blocks have
            # no fused-attention Pallas path, so fast=True is the dtype
            # cut, and fast="int8" adds W8A8 projections (below).
            import dataclasses
            import jax.numpy as jnp
            config = dataclasses.replace(config, dtype=jnp.bfloat16)
        self.config = config
        self._tower = DINOv3ViT(config, pooling="mean_all")
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
                # all 7 block projections through the streaming W8A8
                # kernel (models/layers._QuantRoutingModule); RoPE,
                # softmax, and LayerScale stay bf16.  NOTE: measured
                # SLOWER than bf16 at ViT-L geometry (347 vs 753
                # slices/s — the per-call activation-quantize pass and
                # s8-at-bf16-rate matmuls lose to XLA when the block
                # can't be fused; docs/PERF_NOTES.md).  Use for memory
                # footprint, not throughput.
                from emr2a_tpu.models.quantize import quantize_params_tree
                params = quantize_params_tree(params)

        def image_apply(p, pixels):
            return self._tower.apply({"params": p}, pixels)

        super().__init__(
            params=params, image_apply=image_apply, text_apply=None,
            tokenize=None, preprocess=DINOV3_PREPROCESS,
            normalize=True,  # dino_encoder.py:56-57 L2-normalizes
            max_batch=max_batch, device=device, mesh=mesh)

    def encode_batch_texts(self, texts: List[str]):
        # Reference returns None for text (dino_encoder.py:62-64).
        return [None for _ in texts]

    def encode_text(self, text: str):
        return None
