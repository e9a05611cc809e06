"""Early/late fusion of image+text signals.

Semantics parity: retrieval/fusion.py:4-42 and utils/common.py:11-22.
All ops are jitted and batched — late fusion fuses whole score
*matrices* (q, n) rather than the reference's per-query vectors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from emr2a_tpu.ops.similarity import EPS, l2_normalize, l2_normalize_rows


@partial(jax.jit, static_argnames=("mode",))
def normalize_scores(scores: jax.Array, mode: str = "none") -> jax.Array:
    """Score normalization over the last axis. Parity: fusion.py:31-42
    (scalar mean/std/min/max there; here per-row so batched late fusion
    normalizes each query's score vector independently, which matches
    the reference's one-query-at-a-time call pattern)."""
    if mode == "zscore":
        mean = scores.mean(axis=-1, keepdims=True)
        std = scores.std(axis=-1, keepdims=True)
        return (scores - mean) / (std + EPS)
    if mode == "minmax":
        mn = scores.min(axis=-1, keepdims=True)
        mx = scores.max(axis=-1, keepdims=True)
        return (scores - mn) / (mx - mn + EPS)
    return scores


@partial(jax.jit, static_argnames=("score_mode",))
def late_fusion(text_scores: jax.Array, image_scores: jax.Array,
                text_weight: float = 0.4, score_mode: str = "none") -> jax.Array:
    """w*text + (1-w)*image over (optionally normalized) score arrays.
    Parity: fusion.py:4-14."""
    t = normalize_scores(text_scores, score_mode)
    i = normalize_scores(image_scores, score_mode)
    return text_weight * t + (1.0 - text_weight) * i


@jax.jit
def early_fusion(text_embeddings: jax.Array, image_embeddings: jax.Array,
                 text_weight: float = 1.0, image_weight: float = 1.0) -> jax.Array:
    """Weighted concat + row L2-norm. Parity: fusion.py:17-28."""
    fused = jnp.concatenate(
        [text_embeddings * text_weight, image_embeddings * image_weight], axis=-1
    )
    return l2_normalize_rows(fused)


@jax.jit
def concat_embeddings(text_emb: jax.Array, image_emb: jax.Array,
                      text_weight: float = 1.0, image_weight: float = 1.0) -> jax.Array:
    """Single-vector weighted concat with the zero-guarded L2 norm.
    Parity: utils/common.py:11-22 (note: text first, axis 0)."""
    fused = jnp.concatenate([text_emb * text_weight, image_emb * image_weight], axis=0)
    return l2_normalize(fused)


@jax.jit
def concat_fusion_rows(img: jax.Array, txt: jax.Array) -> jax.Array:
    """Row-wise [image | text] concat + eps-L2 norm, the CV evaluator's
    fusion (cv_evaluator.py:99-105; image first there)."""
    return l2_normalize_rows(jnp.concatenate([img, txt], axis=-1))
