"""CLIP encoder: HF CLIPModel checkpoints → flax dual towers.

Capability parity: encoders/clip_encoder.py (image: vision pooler →
visual projection → L2 norm, :52-64; text: EOT pooled → text projection
→ L2 norm, :66-78; true batched paths :80-108).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Optional

import jax
import numpy as np

from emr2a_tpu.encoders.jit_encoder import JitImageTextEncoder
from emr2a_tpu.models.clip import CLIPConfig, CLIPImageTower, CLIPTextTower
from emr2a_tpu.models.convert import (
    convert_hf_clip_image_tower,
    convert_hf_clip_text_tower,
)
from emr2a_tpu.models.checkpoint import load_state_dict
from emr2a_tpu.models.text import CLIPTextConfig
from emr2a_tpu.models.vit import ViTConfig
from emr2a_tpu.ops.preprocess import CLIP_PREPROCESS, PreprocessSpec


def clip_config_from_hf(cfg: dict) -> CLIPConfig:
    v = cfg.get("vision_config", {})
    t = cfg.get("text_config", {})
    act = v.get("hidden_act", "quick_gelu")
    vision = ViTConfig(
        image_size=v.get("image_size", 224),
        patch_size=v.get("patch_size", 32),
        hidden_size=v.get("hidden_size", 768),
        num_layers=v.get("num_hidden_layers", 12),
        num_heads=v.get("num_attention_heads", 12),
        mlp_dim=v.get("intermediate_size", 3072),
        activation=act, ln_eps=v.get("layer_norm_eps", 1e-5),
        use_pre_layernorm=True, patch_bias=False, pooling="cls_ln")
    text = CLIPTextConfig(
        vocab_size=t.get("vocab_size", 49408),
        max_length=t.get("max_position_embeddings", 77),
        hidden_size=t.get("hidden_size", 512),
        num_layers=t.get("num_hidden_layers", 12),
        num_heads=t.get("num_attention_heads", 8),
        mlp_dim=t.get("intermediate_size", 2048),
        activation=t.get("hidden_act", "quick_gelu"),
        ln_eps=t.get("layer_norm_eps", 1e-5),
        eos_token_id=t.get("eos_token_id", 49407))
    return CLIPConfig(vision=vision, text=text,
                      projection_dim=cfg.get("projection_dim", 512))


class CLIPEncoder(JitImageTextEncoder):

    def __init__(self, model_path: Optional[str] = None, device: str = "tpu",
                 config: Optional[CLIPConfig] = None, params=None,
                 tokenizer=None, max_batch: int = 256, mesh=None,
                 fast: bool = False):
        if model_path is not None:
            mp = Path(model_path)
            with (mp / "config.json").open() as f:
                hf_cfg = json.load(f)
            config = clip_config_from_hf(hf_cfg)
            sd = load_state_dict(mp)
            n_v = config.vision.num_layers
            n_t = config.text.num_layers
            params = {
                "image": convert_hf_clip_image_tower(sd, n_v),
                "text": convert_hf_clip_text_tower(sd, n_t),
            }
            if tokenizer is None:
                tokenizer = _load_hf_tokenizer(mp)
        if config is None:
            raise ValueError("CLIPEncoder needs model_path or (config, params)")
        if fast:
            from emr2a_tpu.encoders.biomedclip_encoder import (
                _cast_params_bf16, _fast_config)
            config = _fast_config(config)
            params = _cast_params_bf16(params)
            if fast == "int8":
                from emr2a_tpu.models.quantize import quantize_params_tree
                # both towers: the causal-masked text blocks route
                # through the streaming int8 kernel
                params = quantize_params_tree(params)
        self.config = config
        self._image_tower = CLIPImageTower(config)
        self._text_tower = CLIPTextTower(config)
        self._tokenizer = tokenizer

        spec = PreprocessSpec(resize_size=config.vision.image_size,
                              crop_size=config.vision.image_size,
                              mean=CLIP_PREPROCESS.mean,
                              std=CLIP_PREPROCESS.std)

        def image_apply(p, pixels):
            return self._image_tower.apply({"params": p["image"]}, pixels)

        def text_apply(p, ids, mask):
            return self._text_tower.apply({"params": p["text"]}, ids)

        super().__init__(
            params=params, image_apply=image_apply, text_apply=text_apply,
            tokenize=self._tokenize_texts, preprocess=spec, normalize=True,
            max_batch=max_batch, device=device, mesh=mesh)

    @classmethod
    def random_init(cls, config: CLIPConfig, tokenizer=None, seed: int = 0,
                    **kw) -> "CLIPEncoder":
        """Random-weight instance for tests/dry-runs (no checkpoint)."""
        import jax.numpy as jnp
        key = jax.random.PRNGKey(seed)
        img = CLIPImageTower(config).init(
            key, jnp.zeros((1, config.vision.image_size,
                            config.vision.image_size, 3)))["params"]
        txt = CLIPTextTower(config).init(
            key, jnp.zeros((1, 8), jnp.int32))["params"]
        return cls(config=config, params={"image": img, "text": txt},
                   tokenizer=tokenizer, **kw)

    def _tokenize_texts(self, texts: List[str]):
        if self._tokenizer is None:
            raise NotImplementedError("no tokenizer available")
        enc = self._tokenizer(texts, padding="max_length",
                              max_length=self.config.text.max_length,
                              truncation=True, return_tensors="np")
        return enc["input_ids"].astype(np.int32), None


def _load_hf_tokenizer(path: Path):
    try:
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(str(path))
    except Exception:
        return None
