"""Qwen3-VL hidden-state-tap encoder.

Semantics parity with the reference thinking encoders
(encoders/qwen3_vl_8b_thinking_encoder.py, byte-identical 2B variant):

- image embedding: outputs of the last-3 vision blocks (forward hooks
  there; explicit ``tap_layers`` returns here), mean-pooled over the
  token axis per layer, averaged across layers (:83-150).  The
  reference runs the full multimodal LM to fire the hooks; the vision
  tower alone produces identical tap values, so this build runs just
  the tower — same embedding, ~LM-cost cheaper.
- text embedding: mean over sequence of the final hidden state of a
  chat-templated LM forward (:152-173).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emr2a_tpu.encoders.base import BaseEncoder

logger = logging.getLogger(__name__)
from emr2a_tpu.models.qwen3_vl import (
    Qwen3VLConfig,
    QwenTextModel,
    QwenVisionTower,
    compute_mrope_position_ids,
)


def make_image_processor(vision_cfg, min_pixels: int = 56 * 56,
                         max_pixels: int = 12845056, **kwargs):
    """Qwen patch-layout image processor (offline-capable HF class)."""
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor)
    # NB: inherits Qwen2-VL's CLIP normalization statistics; real
    # checkpoints should load their own preprocessor_config.json (the
    # encoder/backend prefer AutoImageProcessor when available).  Pass
    # image_mean/image_std here to override for other releases.
    return Qwen2VLImageProcessor(
        patch_size=vision_cfg.patch_size,
        temporal_patch_size=vision_cfg.temporal_patch_size,
        merge_size=vision_cfg.spatial_merge_size,
        min_pixels=min_pixels, max_pixels=max_pixels, **kwargs)


class Qwen3VLEncoder(BaseEncoder):

    def __init__(self, model_path: Optional[str] = None, device: str = "tpu",
                 target_layers: List[int] = [-3, -2, -1],
                 config: Optional[Qwen3VLConfig] = None, params=None,
                 tokenizer=None, image_processor=None,
                 cache_params: bool = True):
        super().__init__(device)
        self.target_layers = list(target_layers)
        if model_path is not None:
            mp = Path(model_path)
            # one shared bring-up recipe with the judge backend
            # (models/checkpoint.load_qwen3_vl: config.json -> convert
            # -> Orbax converted-params cache)
            from emr2a_tpu.models.checkpoint import load_qwen3_vl
            config, params = load_qwen3_vl(mp, config, params,
                                           cache_params)
            if tokenizer is None:
                try:
                    from transformers import AutoTokenizer
                    tokenizer = AutoTokenizer.from_pretrained(str(mp))
                except Exception:
                    tokenizer = None
            if image_processor is None:
                try:
                    from transformers import AutoImageProcessor
                    image_processor = AutoImageProcessor.from_pretrained(str(mp))
                except Exception:
                    image_processor = None
        if config is None or params is None:
            raise ValueError("Qwen3VLEncoder needs model_path or (config, params)")
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.image_processor = image_processor or make_image_processor(config.vision)
        self.embed_dim = config.vision.hidden_size

        depth = config.vision.depth
        self.tap_indices = tuple(sorted(
            depth + t if t < 0 else t for t in self.target_layers
            if 0 <= (depth + t if t < 0 else t) < depth))
        if not self.tap_indices:
            # fail loudly here: an empty tap set would otherwise crash
            # inside the jitted forward, which encode_batch_images
            # degrades to a warning — every image would encode to None
            raise ValueError(
                f"target_layers {self.target_layers} are all out of "
                f"range for a depth-{depth} vision tower")
        self._vision = QwenVisionTower(config.vision)
        self._text = QwenTextModel(config.text)
        self._jit_vision: Dict = {}
        self._jit_text: Dict = {}

    # -- image path --

    def _vision_forward(self, grid: Tuple[Tuple[int, int, int], ...]):
        if grid not in self._jit_vision:
            def fn(params, patches):
                _, _, taps = self._vision.apply(
                    {"params": params["visual"]}, patches, grid,
                    tap_layers=self.tap_indices)
                # mean over token axis per tap, then mean across taps
                pooled = [t.mean(axis=0) for t in taps]
                return jnp.stack(pooled).mean(axis=0)
            self._jit_vision[grid] = jax.jit(fn)
        return self._jit_vision[grid]

    def encode_batch_images(self, images: List[Optional[np.ndarray]]
                            ) -> List[Optional[np.ndarray]]:
        out: List[Optional[np.ndarray]] = []
        for img in images:
            if img is None:
                out.append(None)
                continue
            try:
                proc = self.image_processor(images=[np.asarray(img)],
                                            return_tensors="np")
                patches = proc["pixel_values"]
                grid = tuple(tuple(int(x) for x in g)
                             for g in proc["image_grid_thw"])
                emb = self._vision_forward(grid)(self.params,
                                                 jnp.asarray(patches))
                out.append(np.asarray(emb, dtype=np.float32))
            except Exception as e:
                logger.warning("Failed to encode image: %s", e)
                out.append(None)
        return out

    # -- text path --

    def _text_forward(self, bucket: int):
        if bucket not in self._jit_text:
            def run(module, ids, pos):
                embeds = module.embed_tokens(ids)
                return module(embeds, pos, return_hidden=True)

            def fn(params, input_ids, position_ids, true_len):
                hidden, _ = self._text.apply(
                    {"params": params["language_model"]}, input_ids,
                    position_ids, method=run)
                # masked mean over the real tokens: the default mask is
                # causal, so right padding never influences valid
                # positions, and excluding it from the mean makes
                # bucketed == unpadded exactly
                valid = (jnp.arange(hidden.shape[1])[None, :, None]
                         < true_len).astype(hidden.dtype)
                return ((hidden * valid).sum(axis=1)
                        / jnp.maximum(true_len, 1).astype(hidden.dtype))
            self._jit_text[bucket] = jax.jit(fn)
        return self._jit_text[bucket]

    def _chat_wrap(self, text: str) -> str:
        if self.tokenizer is not None and hasattr(self.tokenizer,
                                                  "apply_chat_template"):
            try:
                return self.tokenizer.apply_chat_template(
                    [{"role": "user", "content": text}], tokenize=False,
                    add_generation_prompt=True)
            except Exception:
                pass
        return text

    def encode_batch_texts(self, texts: List[str]) -> List[Optional[np.ndarray]]:
        if self.tokenizer is None:
            raise NotImplementedError("no tokenizer available")
        out: List[Optional[np.ndarray]] = []
        for text in texts:
            try:
                prompt = self._chat_wrap(text)
                ids = np.asarray(
                    self.tokenizer(prompt, return_tensors="np")["input_ids"],
                    dtype=np.int64)
                # pad to a 128 bucket: one XLA compile per bucket
                # instead of one per distinct text length (big-model
                # compiles cost minutes on this instance)
                true_len = ids.shape[1]
                bucket = -(-true_len // 128) * 128
                if bucket > true_len:
                    ids = np.pad(ids, [(0, 0), (0, bucket - true_len)])
                pos = compute_mrope_position_ids(
                    ids, [], self.config.image_token_id)
                emb = self._text_forward(bucket)(
                    self.params, jnp.asarray(ids), jnp.asarray(pos),
                    jnp.int32(true_len))
                out.append(np.asarray(emb[0], dtype=np.float32))
            except Exception as e:
                logger.warning("Failed to encode text: %s", e)
                out.append(None)
        return out
