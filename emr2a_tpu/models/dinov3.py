"""DINOv3 ViT in flax: RoPE over patch centers, LayerScale, registers.

Capability target: the reference's DINO encoder
(encoders/dino_encoder.py:27-80) loads HF ``facebook/dinov3-vitl16`` and
mean-pools ``last_hidden_state``.  This module reproduces the HF
DINOv3ViTModel forward semantics (verified by parity test against a
random-init torch model): patch conv → [cls | registers | patches] →
N × (pre-LN attn with patch-only RoPE + LayerScale, pre-LN (gated) MLP
+ LayerScale) → final LN.

RoPE detail: 2D patch-center coordinates normalized to [-1, 1], angle
base ``rope_theta``; head_dim/4 frequencies per axis, angles tiled ×2,
rotate-half convention, applied to patch tokens only (prefix tokens
pass through).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from emr2a_tpu.models.layers import ACTIVATIONS, _QuantRoutingModule


@dataclass(frozen=True)
class DINOv3Config:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 1024      # vitl16
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    activation: str = "gelu"
    ln_eps: float = 1e-5
    num_register_tokens: int = 4
    rope_theta: float = 100.0
    use_gated_mlp: bool = False
    query_bias: bool = True
    key_bias: bool = False
    value_bias: bool = True
    proj_bias: bool = True
    mlp_bias: bool = True
    dtype: jnp.dtype = jnp.float32


DINOV3_VITL16 = DINOv3Config()


def rope_angles(num_h: int, num_w: int, head_dim: int, theta: float):
    """cos/sin of shape (num_h*num_w, head_dim) for patch-center RoPE."""
    coords_h = (np.arange(0.5, num_h, dtype=np.float32) / num_h)
    coords_w = (np.arange(0.5, num_w, dtype=np.float32) / num_w)
    hh, ww = np.meshgrid(coords_h, coords_w, indexing="ij")
    coords = np.stack([hh, ww], axis=-1).reshape(-1, 2) * 2.0 - 1.0  # (hw, 2)
    inv_freq = 1.0 / theta ** np.arange(0, 1, 4 / head_dim, dtype=np.float32)
    angles = 2 * np.pi * coords[:, :, None] * inv_freq[None, None, :]
    angles = angles.reshape(angles.shape[0], -1)
    angles = np.tile(angles, (1, 2))  # (hw, head_dim)
    return jnp.asarray(np.cos(angles)), jnp.asarray(np.sin(angles))


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope_to_patches(q, k, cos, sin, num_prefix: int):
    """q/k: (B, S, H, D); RoPE on tokens [num_prefix:]."""
    # keep the compute dtype: the f32 cos/sin tables would otherwise
    # promote bf16 q/k to f32 through every layer's QK^T (half the MXU
    # rate and double the HBM traffic on the bf16 fast path)
    cos = cos.astype(q.dtype)[None, :, None, :]
    sin = sin.astype(q.dtype)[None, :, None, :]
    qp = q[:, num_prefix:]
    kp = k[:, num_prefix:]
    qp = qp * cos + _rotate_half(qp) * sin
    kp = kp * cos + _rotate_half(kp) * sin
    q = jnp.concatenate([q[:, :num_prefix], qp], axis=1)
    k = jnp.concatenate([k[:, :num_prefix], kp], axis=1)
    return q, k


class DINOv3Attention(_QuantRoutingModule):
    config: DINOv3Config

    @nn.compact
    def __call__(self, x, cos, sin, num_prefix):
        cfg = self.config
        B, S, d = x.shape
        head_dim = d // cfg.num_heads
        # _proj routes through the streaming W8A8 kernel when params
        # are quantized (models/quantize.py) — RoPE/softmax stay bf16
        q = self._proj("q_proj", d, cfg.query_bias, x)
        k = self._proj("k_proj", d, cfg.key_bias, x)
        v = self._proj("v_proj", d, cfg.value_bias, x)
        q = q.reshape(B, S, cfg.num_heads, head_dim)
        k = k.reshape(B, S, cfg.num_heads, head_dim)
        v = v.reshape(B, S, cfg.num_heads, head_dim)
        q, k = apply_rope_to_patches(q, k, cos, sin, num_prefix)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * head_dim ** -0.5
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, S, d)
        return self._proj("o_proj", d, cfg.proj_bias, out)


class DINOv3Mlp(_QuantRoutingModule):
    config: DINOv3Config

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        act = ACTIVATIONS[cfg.activation]
        if cfg.use_gated_mlp:
            g = self._proj("gate_proj", cfg.mlp_dim, cfg.mlp_bias, x)
            u = self._proj("up_proj", cfg.mlp_dim, cfg.mlp_bias, x)
            h = act(g) * u
        else:
            h = act(self._proj("up_proj", cfg.mlp_dim, cfg.mlp_bias, x))
        return self._proj("down_proj", x.shape[-1], cfg.mlp_bias, h)


class DINOv3Block(nn.Module):
    config: DINOv3Config

    @nn.compact
    def __call__(self, x, cos, sin, num_prefix):
        cfg = self.config
        d = cfg.hidden_size
        ls1 = self.param("layer_scale1", nn.initializers.ones, (d,))
        ls2 = self.param("layer_scale2", nn.initializers.ones, (d,))
        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype, name="norm1")(x)
        x = x + ls1 * DINOv3Attention(cfg, name="attn")(h, cos, sin, num_prefix)
        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype, name="norm2")(x)
        x = x + ls2 * DINOv3Mlp(cfg, name="mlp")(h)
        return x


class DINOv3ViT(nn.Module):
    config: DINOv3Config
    pooling: str = "none"  # "none" | "cls" | "mean_all" (reference dino_encoder)

    @nn.compact
    def __call__(self, pixels):
        cfg = self.config
        B, H, W, C = pixels.shape
        p = cfg.patch_size
        gh, gw = H // p, W // p

        x = pixels.reshape(B, gh, p, gw, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, p * p * C)
        x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="patch_embed")(x)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, cfg.hidden_size))
        prefix = [jnp.broadcast_to(cls, (B, 1, cfg.hidden_size)).astype(x.dtype)]
        num_prefix = 1
        if cfg.num_register_tokens:
            reg = self.param("register_tokens", nn.initializers.normal(0.02),
                             (1, cfg.num_register_tokens, cfg.hidden_size))
            prefix.append(jnp.broadcast_to(
                reg, (B, cfg.num_register_tokens, cfg.hidden_size)).astype(x.dtype))
            num_prefix += cfg.num_register_tokens
        x = jnp.concatenate(prefix + [x], axis=1)

        cos, sin = rope_angles(gh, gw, cfg.hidden_size // cfg.num_heads,
                               cfg.rope_theta)
        for i in range(cfg.num_layers):
            x = DINOv3Block(cfg, name=f"block_{i}")(x, cos, sin, num_prefix)

        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype, name="final_ln")(x)
        if self.pooling == "cls":
            return x[:, 0]
        if self.pooling == "mean_all":
            # Reference dino_encoder.py:52-57 mean-pools ALL tokens
            # (cls + registers + patches) of last_hidden_state.
            return x.mean(axis=1)
        return x


def convert_hf_dinov3(sd, num_layers: int, prefix: str = "") -> dict:
    """HF DINOv3ViTModel state dict -> DINOv3ViT params."""
    from emr2a_tpu.models.convert import _dense, _ln, _patch_conv_to_dense

    e = prefix + "embeddings."
    params = {
        "patch_embed": _patch_conv_to_dense(
            sd[e + "patch_embeddings.weight"], sd.get(e + "patch_embeddings.bias")),
        "cls_token": sd[e + "cls_token"],
        "final_ln": _ln(sd, prefix + "norm"),
    }
    if e + "register_tokens" in sd and sd[e + "register_tokens"].shape[1]:
        params["register_tokens"] = sd[e + "register_tokens"]
    for i in range(num_layers):
        p = f"{prefix}layer.{i}."
        block = {
            "norm1": _ln(sd, p + "norm1"),
            "attn": {
                "q_proj": _dense(sd, p + "attention.q_proj"),
                "k_proj": _dense(sd, p + "attention.k_proj"),
                "v_proj": _dense(sd, p + "attention.v_proj"),
                "o_proj": _dense(sd, p + "attention.o_proj"),
            },
            "layer_scale1": sd[p + "layer_scale1.lambda1"],
            "norm2": _ln(sd, p + "norm2"),
            "layer_scale2": sd[p + "layer_scale2.lambda1"],
        }
        mlp = {}
        if p + "mlp.gate_proj.weight" in sd:
            mlp["gate_proj"] = _dense(sd, p + "mlp.gate_proj")
        mlp["up_proj"] = _dense(sd, p + "mlp.up_proj")
        mlp["down_proj"] = _dense(sd, p + "mlp.down_proj")
        block["mlp"] = mlp
        params[f"block_{i}"] = block
    return params
