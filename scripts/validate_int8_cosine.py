"""On-chip validation of the W8A8 trunk: full ViT-B BioMedCLIP tower,
int8 vs bf16 embedding cosine (recorded in docs/PERF_NOTES.md:
min 0.9993 / mean 0.9997 — ranking equivalent)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from emr2a_tpu.encoders.biomedclip_encoder import default_biomedclip_config
from emr2a_tpu.models.clip import BioMedCLIPImageTower
from emr2a_tpu.models.quantize import quantize_tower_params
from emr2a_tpu.models.vit import ViTConfig
from emr2a_tpu.ops.preprocess import BIOMEDCLIP_PREPROCESS, preprocess_images


def main():
    base = default_biomedclip_config()
    vcfg = ViTConfig(**{**base.vision.__dict__, "dtype": jnp.bfloat16,
                        "fused_mlp": True, "fused_attn": True})
    config = type(base)(vision=vcfg, text=base.text,
                        projection_dim=base.projection_dim,
                        text_proj=base.text_proj)
    tower = BioMedCLIPImageTower(config)
    params = tower.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 3), jnp.float32))["params"]
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    qparams = {**params, "trunk": quantize_tower_params(params["trunk"])}
    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (16, 224, 224, 3), np.uint8))

    @jax.jit
    def fwd(p, im):
        px = preprocess_images(im, BIOMEDCLIP_PREPROCESS)
        f = tower.apply({"params": p}, px.astype(jnp.bfloat16))
        f = f.astype(jnp.float32)
        return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-12)

    a = np.asarray(fwd(params, imgs), np.float64)
    b = np.asarray(fwd(qparams, imgs), np.float64)
    cos = (a * b).sum(1)
    print(f"ViT-B int8 vs bf16 full-tower cosine: "
          f"min {cos.min():.6f} mean {cos.mean():.6f}")


if __name__ == "__main__":
    main()
