"""Shared transformer building blocks (flax.linen).

All towers in the zoo (CLIP vision/text, BioMedCLIP, HF/timm ViT,
DINOv3, BERT) are assembled from these blocks.  Design points for TPU:

- Attention is einsum-based; XLA maps the contractions onto the MXU and
  fuses softmax elementwise ops.  Head dims are 64 — batched matmuls
  keep lanes full at typical batch sizes.
- Dtype policy: params can be loaded bf16; layernorms and softmax
  accumulate in f32 (``preferred_element_type`` / explicit casts).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def quick_gelu(x):
    """CLIP's approximate GELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS: dict[str, Callable] = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


class _QuantRoutingModule(nn.Module):
    """Mixin: a dense projection that routes through the streaming
    W8A8 Pallas kernel when this module's params carry int8 weights
    (models/quantize.py layout: kernel_q + kernel_scale).

    This is what makes quantized params work on EVERY tower — masked
    attention (BERT padding, CLIP causal), biasless QKV, and shapes the
    fused LN+attention/LN+MLP kernels reject all execute natively in
    int8 instead of crashing on a missing 'kernel' (advisor round-2
    finding) or paying a dequantize pass.
    """

    def _proj(self, name: str, features: int, use_bias: bool, h):
        # dtype lives at self.dtype here and at self.config.dtype on
        # config-carrying modules (DINOv3)
        dtype = getattr(self, "dtype", None)
        if dtype is None:
            dtype = self.config.dtype
        if not self.is_initializing():
            p = self.variables["params"].get(name)
            if p is not None and "kernel_q" in p:
                from emr2a_tpu.ops.linear_int8 import linear_w8a8
                return linear_w8a8(
                    h, p["kernel_q"], p["kernel_scale"], p.get("bias"),
                    out_dtype=dtype,
                    interpret=jax.default_backend() != "tpu")
        return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                        name=name)(h)


class MultiHeadAttention(_QuantRoutingModule):
    """Standard MHA with separate q/k/v/out projections and optional
    additive attention bias/mask.  Softmax in f32."""

    num_heads: int
    head_dim: Optional[int] = None
    qkv_bias: bool = True
    out_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        d_model = x.shape[-1]
        head_dim = self.head_dim or d_model // self.num_heads
        inner = self.num_heads * head_dim

        q = self._proj("q_proj", inner, self.qkv_bias, x)
        k = self._proj("k_proj", inner, self.qkv_bias, x)
        v = self._proj("v_proj", inner, self.qkv_bias, x)

        B, S = x.shape[0], x.shape[1]
        shape = (B, S, self.num_heads, head_dim)
        q = q.reshape(shape)
        k = k.reshape(shape)
        v = v.reshape(shape)

        scale = head_dim ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(B, S, inner)
        return self._proj("out_proj", d_model, self.out_bias, out)


class Mlp(_QuantRoutingModule):
    hidden_dim: int
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d_model = x.shape[-1]
        h = self._proj("fc1", self.hidden_dim, True, x)
        h = ACTIVATIONS[self.activation](h)
        return self._proj("fc2", d_model, True, h)


class TransformerBlock(nn.Module):
    """Pre-LN transformer block: x + attn(ln1(x)); x + mlp(ln2(x)).

    ``fused_mlp=True`` routes the LN2+MLP+residual half through the
    Pallas kernel (ops/mlp.py): same parameters, ~25% faster on TPU at
    ViT-B shapes, gelu evaluated in tanh approximation.
    """

    num_heads: int
    mlp_dim: int
    activation: str = "gelu"
    ln_eps: float = 1e-5
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    fused_mlp: bool = False
    fused_attn: bool = False
    # Set when the caller keeps its token axis pre-padded across layers
    # (models/vit.py fast path): rows >= valid_len are padding — masked
    # as attention keys, junk as outputs.
    valid_len: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask=None):
        # fused_attn covers the LN1+attention+residual half with the
        # Pallas kernel (ops/attention_block.py); external masks,
        # biasless QKV, and shapes whose kernel buffers exceed the VMEM
        # budget (e.g. ViT-L/336) fall back to the einsum path.
        fused_params = None
        if (self.fused_attn and x.ndim == 3 and mask is None
                and self.qkv_bias and not self.is_initializing()):
            from emr2a_tpu.ops.attention_block import pick_fused_attn_params
            # int8 weights halve residency — W8A8 params unlock shapes
            # (e.g. CLIP ViT-L/336) the bf16 budget rejects
            w8 = "kernel_q" in self.variables["params"]["attn"]["q_proj"]
            fused_params = pick_fused_attn_params(
                x.shape[-1], x.shape[1], self.num_heads,
                weight_itemsize=1 if w8 else 2)
        # Off-TPU (CPU-mesh tests, dryrun_multichip) the same kernels
        # run in Pallas interpret mode, so the fast path's code path —
        # not an einsum stand-in — is what multi-chip dryruns validate.
        interpret = jax.default_backend() != "tpu"
        if fused_params is None and self.valid_len is not None and mask is None:
            # pre-padded tokens + einsum fallback: mask pad keys so the
            # padding stays inert (additive (1, 1, 1, S) mask)
            key_pos = jnp.arange(x.shape[1])[None, None, None, :]
            mask = jnp.where(key_pos < self.valid_len, 0.0,
                             jnp.finfo(jnp.float32).min)
        if fused_params is not None:
            block_b, head_group = fused_params
            p = self.variables["params"]
            pa = p["attn"]
            if "kernel_q" in pa["q_proj"]:
                # W8A8 params (models/quantize.quantize_tower_params)
                from emr2a_tpu.ops.attention_block import (
                    fused_ln_attention_int8)
                x = fused_ln_attention_int8(
                    x, p["ln1"]["scale"].astype(self.dtype),
                    p["ln1"]["bias"].astype(self.dtype),
                    *(a for proj in ("q_proj", "k_proj", "v_proj", "out_proj")
                      for a in (pa[proj]["kernel_q"],
                                pa[proj]["kernel_scale"],
                                pa[proj]["bias"].astype(self.dtype))),
                    num_heads=self.num_heads, eps=self.ln_eps,
                    head_group=head_group, block_b=block_b,
                    valid_len=self.valid_len, interpret=interpret)
            else:
                from emr2a_tpu.ops.attention_block import fused_ln_attention
                x = fused_ln_attention(
                    x, p["ln1"]["scale"].astype(self.dtype),
                    p["ln1"]["bias"].astype(self.dtype),
                    pa["q_proj"]["kernel"].astype(self.dtype),
                    pa["q_proj"]["bias"].astype(self.dtype),
                    pa["k_proj"]["kernel"].astype(self.dtype),
                    pa["k_proj"]["bias"].astype(self.dtype),
                    pa["v_proj"]["kernel"].astype(self.dtype),
                    pa["v_proj"]["bias"].astype(self.dtype),
                    pa["out_proj"]["kernel"].astype(self.dtype),
                    pa["out_proj"]["bias"].astype(self.dtype),
                    num_heads=self.num_heads, eps=self.ln_eps,
                    head_group=head_group, block_b=block_b,
                    valid_len=self.valid_len, interpret=interpret)
        else:
            h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                             name="ln1")(x)
            # quantized params route through the streaming W8A8 kernel
            # inside MultiHeadAttention (masks/odd shapes the fused
            # kernel rejects still run natively in int8)
            x = x + MultiHeadAttention(
                num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                dtype=self.dtype, name="attn")(h, mask)
        use_fused_mlp = self.fused_mlp and x.ndim == 3
        if use_fused_mlp and not self.is_initializing():
            # The fused kernel keeps both MLP weight matrices VMEM-
            # resident; at ViT-L shapes (1024 x 4096) that is 16.8 MB
            # bf16 — over the 16 MB scoped limit — while int8 (8.4 MB)
            # fits.  Gate like pick_fused_attn_params and fall back to
            # the einsum/streaming path when it can't fit.
            w8 = "kernel_q" in self.variables["params"]["mlp"]["fc1"]
            d_model = x.shape[-1]
            itemsize = 1 if w8 else 2
            tile = 256
            vmem = (2 * d_model * self.mlp_dim * itemsize
                    + tile * (self.mlp_dim + d_model) * 4)
            use_fused_mlp = vmem < 14 * 2**20
        if use_fused_mlp:
            from emr2a_tpu.ops.mlp import fused_ln_mlp
            ln2 = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                               name="ln2")
            mlp = Mlp(self.mlp_dim, activation=self.activation,
                      dtype=self.dtype, name="mlp")
            # Materialize the submodule params without running them.
            if self.is_initializing():
                h = ln2(x)
                return x + mlp(h)
            p = self.variables["params"]
            B, S, d = x.shape
            if "kernel_q" in p["mlp"]["fc1"]:
                from emr2a_tpu.ops.mlp import fused_ln_mlp_int8
                out = fused_ln_mlp_int8(
                    x.reshape(B * S, d),
                    p["ln2"]["scale"].astype(self.dtype),
                    p["ln2"]["bias"].astype(self.dtype),
                    p["mlp"]["fc1"]["kernel_q"],
                    p["mlp"]["fc1"]["kernel_scale"],
                    p["mlp"]["fc1"]["bias"].astype(self.dtype),
                    p["mlp"]["fc2"]["kernel_q"],
                    p["mlp"]["fc2"]["kernel_scale"],
                    p["mlp"]["fc2"]["bias"].astype(self.dtype),
                    # tile 256: the isolated block measured 512
                    # slightly faster (1.171 vs 1.195 ms) but the
                    # end-to-end bench is definitive: 6719 slices/s at
                    # 256 vs 6555 at 512
                    eps=self.ln_eps, activation=self.activation, tile=256,
                    interpret=interpret)
            else:
                out = fused_ln_mlp(
                    x.reshape(B * S, d),
                    p["ln2"]["scale"].astype(self.dtype),
                    p["ln2"]["bias"].astype(self.dtype),
                    p["mlp"]["fc1"]["kernel"].astype(self.dtype),
                    p["mlp"]["fc1"]["bias"].astype(self.dtype),
                    p["mlp"]["fc2"]["kernel"].astype(self.dtype),
                    p["mlp"]["fc2"]["bias"].astype(self.dtype),
                    eps=self.ln_eps, activation=self.activation, tile=256,
                    interpret=interpret)
            return out.reshape(B, S, d)
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="ln2")(x)
        x = x + Mlp(self.mlp_dim, activation=self.activation,
                    dtype=self.dtype, name="mlp")(h)
        return x


def make_causal_mask(seq_len: int, dtype=jnp.float32):
    """Additive causal mask (1, 1, S, S) with -inf above the diagonal."""
    mask = jnp.triu(jnp.full((seq_len, seq_len), -jnp.inf, dtype=dtype), k=1)
    return mask[None, None, :, :]


def make_padding_mask(attention_mask, dtype=jnp.float32):
    """(B, S) 1/0 mask -> additive (B, 1, 1, S)."""
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, dtype)
    return jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
