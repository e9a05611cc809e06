"""Text towers: CLIP text transformer and BERT (PubMedBERT-256).

- CLIP text (reference encoders/clip_encoder.py:66-78 uses HF
  pooler_output → projection → L2 norm): causal transformer over BPE
  ids; pooled = final-LN hidden state at the EOT position (highest
  token id position, HF convention).
- BERT covers BioMedCLIP's text tower (PubMedBERT_base_uncased_abstract,
  256-token context) with cls-token pooling as in open_clip's
  ``ClsLastHiddenStatePooler``.  BERT is post-LN (residual then LN),
  so it gets its own block rather than reusing the pre-LN one.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import linen as nn

from emr2a_tpu.models.layers import (
    Mlp,
    MultiHeadAttention,
    TransformerBlock,
    make_causal_mask,
    make_padding_mask,
)


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    max_length: int = 77
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    mlp_dim: int = 2048
    activation: str = "quick_gelu"
    ln_eps: float = 1e-5
    eos_token_id: int = 49407
    dtype: jnp.dtype = jnp.float32


class CLIPTextTransformer(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids: (B, S) padded to max_length with the pad/eos id.
        Returns pooled (B, hidden) at the EOT position."""
        cfg = self.config
        B, S = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                       name="token_embed")(input_ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.01),
                         (1, cfg.max_length, cfg.hidden_size))
        x = tok + pos[:, :S].astype(tok.dtype)

        mask = make_causal_mask(S)
        for i in range(cfg.num_layers):
            x = TransformerBlock(
                num_heads=cfg.num_heads, mlp_dim=cfg.mlp_dim,
                activation=cfg.activation, ln_eps=cfg.ln_eps,
                dtype=cfg.dtype, name=f"block_{i}")(x, mask)

        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype, name="final_ln")(x)
        # EOT pooling: position of the first eos token (HF takes argmax of
        # (ids == eos) which returns the first occurrence).
        eot = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        return x[jnp.arange(B), eot]


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    max_length: int = 512
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    activation: str = "gelu"
    ln_eps: float = 1e-12
    type_vocab_size: int = 2
    dtype: jnp.dtype = jnp.float32


class BertLayer(nn.Module):
    """Post-LN BERT block: LN(x + attn(x)); LN(x + mlp(x))."""

    num_heads: int
    mlp_dim: int
    activation: str
    ln_eps: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, mask=None):
        a = MultiHeadAttention(num_heads=self.num_heads, dtype=self.dtype,
                               name="attn")(x, mask)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="attn_ln")(x + a)
        m = Mlp(self.mlp_dim, activation=self.activation, dtype=self.dtype,
                name="mlp")(x)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="mlp_ln")(x + m)
        return x


class BertEncoder(nn.Module):
    config: BertConfig
    pooling: str = "cls"  # "cls" (open_clip BioMedCLIP) | "pooler" | "none"

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        cfg = self.config
        B, S = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                       name="token_embed")(input_ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.max_length, cfg.hidden_size))
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                       name="type_embed")(token_type_ids)
        x = tok + pos[:, :S].astype(tok.dtype) + typ
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype,
                         name="embed_ln")(x)

        mask = (make_padding_mask(attention_mask)
                if attention_mask is not None else None)
        for i in range(cfg.num_layers):
            x = BertLayer(num_heads=cfg.num_heads, mlp_dim=cfg.mlp_dim,
                          activation=cfg.activation, ln_eps=cfg.ln_eps,
                          dtype=cfg.dtype, name=f"block_{i}")(x, mask)

        if self.pooling == "cls":
            return x[:, 0]
        if self.pooling == "pooler":
            h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="pooler")(x[:, 0])
            return jnp.tanh(h)
        if self.pooling == "none":
            return x
        raise ValueError(f"unknown pooling {self.pooling}")
