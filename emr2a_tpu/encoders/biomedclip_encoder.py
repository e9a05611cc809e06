"""BioMedCLIP encoder: open_clip checkpoint → flax towers.

Capability parity: encoders/biomedclip_encoder.py (open_clip BiomedCLIP
ViT-B/16 + PubMedBERT-256; L2-normalized image/text features :51-75).
The reference's batch path loops singles (:77-81) — here both paths are
true batched jit calls.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import jax
import numpy as np

from emr2a_tpu.encoders.jit_encoder import JitImageTextEncoder
from emr2a_tpu.models.checkpoint import load_state_dict
from emr2a_tpu.models.clip import (
    BioMedCLIPConfig,
    BioMedCLIPImageTower,
    BioMedCLIPTextTower,
)
from emr2a_tpu.models.convert import (
    convert_biomedclip_image_tower,
    convert_biomedclip_text_tower,
)
from emr2a_tpu.models.text import BertConfig
from emr2a_tpu.models.vit import BIOMEDCLIP_VIT_B16
from emr2a_tpu.ops.preprocess import BIOMEDCLIP_PREPROCESS


def default_biomedclip_config() -> BioMedCLIPConfig:
    """hf-hub:microsoft/BiomedCLIP-PubMedBERT_256-vit_base_patch16_224:
    timm ViT-B/16 image tower, PubMedBERT (context 256, proj mlp)."""
    return BioMedCLIPConfig(
        vision=BIOMEDCLIP_VIT_B16,
        text=BertConfig(vocab_size=30522, max_length=512, hidden_size=768,
                        num_layers=12, num_heads=12, mlp_dim=3072),
        projection_dim=512, text_proj="mlp")


class BioMedCLIPEncoder(JitImageTextEncoder):

    def __init__(self, model_path: Optional[str] = None, device: str = "tpu",
                 config: Optional[BioMedCLIPConfig] = None, params=None,
                 tokenizer=None, max_batch: int = 256,
                 context_length: int = 256, mesh=None, fast: bool = False):
        if config is None:
            config = default_biomedclip_config()
        if fast:
            config = _fast_config(config)
        if model_path is not None:
            sd = load_state_dict(Path(model_path))
            params = {
                "image": convert_biomedclip_image_tower(sd, config.vision.num_layers),
                "text": convert_biomedclip_text_tower(sd, config.text.num_layers),
            }
            if tokenizer is None:
                try:
                    from transformers import AutoTokenizer
                    tokenizer = AutoTokenizer.from_pretrained(str(model_path))
                except Exception:
                    tokenizer = None
        if params is None:
            raise ValueError("BioMedCLIPEncoder needs model_path or params")
        if fast:
            params = _cast_params_bf16(params)
            if fast == "int8":
                from emr2a_tpu.models.quantize import (
                    quantize_params_tree, quantize_tower_params)
                params = {
                    "image": {
                        **params["image"],
                        "trunk": quantize_tower_params(
                            params["image"]["trunk"]),
                    },
                    # BERT blocks: W8A8 through the streaming kernel
                    # (attention keeps its padding mask)
                    "text": quantize_params_tree(params["text"]),
                }
        self.config = config
        self.context_length = context_length
        self._image_tower = BioMedCLIPImageTower(config)
        self._text_tower = BioMedCLIPTextTower(config)
        self._tokenizer = tokenizer

        def image_apply(p, pixels):
            return self._image_tower.apply({"params": p["image"]}, pixels)

        def text_apply(p, ids, mask):
            return self._text_tower.apply({"params": p["text"]}, ids, mask)

        super().__init__(
            params=params, image_apply=image_apply, text_apply=text_apply,
            tokenize=self._tokenize_texts, preprocess=BIOMEDCLIP_PREPROCESS,
            normalize=True, max_batch=max_batch, device=device, mesh=mesh)

    @classmethod
    def random_init(cls, config: Optional[BioMedCLIPConfig] = None,
                    tokenizer=None, seed: int = 0, **kw) -> "BioMedCLIPEncoder":
        import jax.numpy as jnp
        config = config or default_biomedclip_config()
        key = jax.random.PRNGKey(seed)
        img = BioMedCLIPImageTower(config).init(
            key, jnp.zeros((1, config.vision.image_size,
                            config.vision.image_size, 3)))["params"]
        txt = BioMedCLIPTextTower(config).init(
            key, jnp.zeros((1, 8), jnp.int32))["params"]
        return cls(config=config, params={"image": img, "text": txt},
                   tokenizer=tokenizer, **kw)

    def _tokenize_texts(self, texts: List[str]):
        if self._tokenizer is None:
            raise NotImplementedError("no tokenizer available")
        enc = self._tokenizer(texts, padding="max_length",
                              max_length=self.context_length,
                              truncation=True, return_tensors="np")
        return (enc["input_ids"].astype(np.int32),
                enc["attention_mask"].astype(np.int32))


def _fast_config(config: BioMedCLIPConfig) -> BioMedCLIPConfig:
    """TPU fast mode: bf16 towers; the image tower gets the fused
    Pallas LN+attention and LN+MLP kernels (docs/PERF_NOTES.md;
    embedding cosine vs f32 einsum path >= 0.9999).  ``fast="int8"``
    additionally quantizes both towers' blocks W8A8 (models/quantize.py;
    ~2x MXU rate on v5e, cosine >= 0.999; the masked BERT attention
    runs its projections through the streaming int8 kernel).  Off-TPU
    the kernels run in Pallas interpret mode; inference-only: the
    Pallas kernels define no VJP, so pass einsum-path towers
    (fast=False) to ContrastiveTrainer."""
    import dataclasses
    import jax.numpy as jnp
    return dataclasses.replace(
        config,
        vision=dataclasses.replace(config.vision, dtype=jnp.bfloat16,
                                   fused_mlp=True, fused_attn=True),
        text=(dataclasses.replace(config.text, dtype=jnp.bfloat16)
              if config.text is not None else None))


def _cast_params_bf16(params):
    import jax
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)


# Reference exports the typo'd class name (encoders/__init__.py) — keep
# an alias so user code ports cleanly.
BioMedCLIPLEncoder = BioMedCLIPEncoder
