"""On-device image preprocessing: resize → center-crop → normalize.

The reference's hot loop decodes with PIL and runs each encoder's HF
processor per image on host (encoders/base.py:27-44, SURVEY.md §3.2).
Here decode stays on host (see data/images.py) but everything after the
uint8 buffer — dtype convert, resize, crop, scale, normalize — is one
jitted XLA region that fuses with the model's patchify-matmul, so the
image tensor crosses HBM exactly once.

Per-family specs mirror each source processor's geometry/statistics;
resize filters match within float tolerance (bicubic/bilinear,
antialiased on downsample), which is the documented-tolerance approach
from SURVEY.md §7 "hard parts".
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class PreprocessSpec:
    resize_size: int = 224          # shortest-edge target (or exact size)
    crop_size: int = 224
    shortest_edge: bool = True      # False: resize to (resize, resize) exactly
    method: str = "bicubic"         # "bilinear" | "bicubic"
    mean: Tuple[float, float, float] = (0.48145466, 0.4578275, 0.40821073)
    std: Tuple[float, float, float] = (0.26862954, 0.26130258, 0.27577711)


# HF CLIPProcessor geometry + OpenAI CLIP statistics.
CLIP_PREPROCESS = PreprocessSpec()
# open_clip default transform (BiomedCLIP): same geometry + statistics.
BIOMEDCLIP_PREPROCESS = PreprocessSpec()
# HF ViTImageProcessor: exact resize, 0.5 statistics, bilinear.
VIT_PREPROCESS = PreprocessSpec(shortest_edge=False, method="bilinear",
                                mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
# timm vit_base_patch16_224 (augreg): crop_pct 0.9 → resize 248, crop 224.
TIMM_VIT_PREPROCESS = PreprocessSpec(resize_size=248, mean=(0.5, 0.5, 0.5),
                                     std=(0.5, 0.5, 0.5))
# DINOv3 (DINOv3ViTImageProcessorFast defaults): exact 224x224 resize,
# bilinear, ImageNet statistics, no crop.
DINOV3_PREPROCESS = PreprocessSpec(shortest_edge=False, method="bilinear",
                                   mean=(0.485, 0.456, 0.406),
                                   std=(0.229, 0.224, 0.225))


def _resize_plan(h: int, w: int, spec: PreprocessSpec) -> Tuple[int, int]:
    # delegates to the host-side helper so the two stay bit-identical
    # (jit_encoder skips the device resample only when they agree)
    from emr2a_tpu.data.images import plan_resize
    return plan_resize(h, w, spec.resize_size, spec.shortest_edge)


@functools.partial(jax.jit, static_argnames=("spec",))
def preprocess_images(images_u8: jax.Array, spec: PreprocessSpec) -> jax.Array:
    """(B, H, W, 3) uint8 -> (B, crop, crop, 3) f32 normalized.

    Static input shape per call; host code buckets mixed-size batches.
    """
    B, H, W, C = images_u8.shape
    x = images_u8.astype(jnp.float32) / 255.0
    rh, rw = _resize_plan(H, W, spec)
    if (rh, rw) != (H, W):
        method = "cubic" if spec.method == "bicubic" else "linear"
        x = jax.image.resize(x, (B, rh, rw, C), method=method, antialias=True)
    # Center crop.
    cs = spec.crop_size
    top = (rh - cs) // 2
    left = (rw - cs) // 2
    x = jax.lax.dynamic_slice(x, (0, top, left, 0), (B, cs, cs, C))
    mean = jnp.asarray(spec.mean, jnp.float32)
    std = jnp.asarray(spec.std, jnp.float32)
    return (x - mean) / std


def sample_slice_indices(n_slices: int, sample_n: int, mode: str = "uniform",
                         seed: int = 42) -> list:
    """Slice-sampling parity with the reference CV runner
    (analysis/run_cv_experiments.py:165-177):

    - ``uniform``: stride positions ``range(0, n, n // k)[:k]``
    - ``random``: ``np.random.seed(42)`` + choice without replacement
      (unsorted, as the reference leaves it)
    - fewer slices than sample_n -> all of them.
    """
    import numpy as np

    if n_slices <= sample_n:
        return list(range(n_slices))
    if mode == "uniform":
        step = n_slices // sample_n
        return list(range(0, n_slices, step))[:sample_n]
    if mode == "random":
        np.random.seed(seed)
        return np.random.choice(n_slices, size=sample_n, replace=False).tolist()
    raise ValueError(f"Unknown sampling strategy: {mode}")
