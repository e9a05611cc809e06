"""Qwen3-VL in JAX/flax: vision tower + text LM + generation.

Capability target (reference): the Qwen3-VL 2B/8B "thinking" models used
as (a) hidden-state-tap encoders
(encoders/qwen3_vl_8b_thinking_encoder.py:60-173) and (b) the
generative judge for audit/review/direct-judging.  Architecture
reproduced from the public HF implementation (verified by parity tests
against random-init torch models):

- Vision: conv3d patch embed (expressed as one dense matmul over the
  flattened (C, tp, p, p) patch), bilinear-interpolated learned pos
  embeddings in spatial-merge token order, 2D rotary embeddings over
  patch coordinates, pre-LN blocks (eps 1e-6, fused-qkv source
  layout), deepstack mergers at configured depths (post-shuffle norm),
  final 2x2 spatial merger to the LM width.
- Text: Qwen3 decoder — RMSNorm, GQA with per-head-dim q/k RMS norms,
  interleaved 3D M-RoPE (t/h/w sections), SwiGLU MLP, tied or separate
  lm_head.
- Fusion: image embeddings spliced at image-token positions
  (gather-by-cumsum instead of masked_scatter), deepstack features
  added to the first len(deepstack) decoder layers' hidden states at
  visual positions.
- Generation: prefill + lax.scan decode over a static-shape KV cache,
  greedy or temperature sampling.

TPU notes: grid_thw and prompt lengths are static per compilation
(bucketed by callers); attention is einsum with f32 softmax; the KV
cache lives in HBM with dynamic_update_slice writes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from emr2a_tpu.models.layers import ACTIVATIONS

# ---------------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class QwenVisionConfig:
    depth: int = 27
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    out_hidden_size: int = 3584
    num_position_embeddings: int = 2304
    deepstack_visual_indexes: Tuple[int, ...] = (8, 16, 24)
    hidden_act: str = "gelu_pytorch_tanh"
    dtype: Any = jnp.float32
    # Frame-batched attention lowering: "einsum" (one batched XLA
    # chain, (F,H,S,S) f32 logits materialized), "scan" (lax.map per
    # frame — one frame's logits at a time stay inside XLA's fusion
    # window), "flash" (Pallas TPU flash kernel), or "auto" (scan on
    # TPU, einsum elsewhere).  Measured head-to-head on-chip at the
    # audit shape F8/H16/S784/hd72 (scripts/exp_vision_attn.py,
    # BENCH_vision_attn.json): scan 0.323 ms/op vs einsum 1.62 vs
    # flash 1.63 (block_k=128) / 0.90 (pad-1024, block 512) — the
    # library flash kernel loses 64% of its MXU lanes to hd 72->128
    # padding, so the fusion-window rewrite wins 5x.  Only the uniform
    # frame-batched path dispatches on this; the flat/masked
    # mixed-layout path stays einsum.
    attn_impl: str = "auto"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2


@dataclass(frozen=True)
class QwenTextConfig:
    vocab_size: int = 151936
    hidden_size: int = 4096
    num_layers: int = 36
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 12288
    rms_norm_eps: float = 1e-6
    rope_theta: float = 5e6
    mrope_section: Tuple[int, int, int] = (24, 20, 20)
    attention_bias: bool = False
    tie_word_embeddings: bool = True
    hidden_act: str = "silu"
    dtype: Any = jnp.float32


@dataclass(frozen=True)
class Qwen3VLConfig:
    vision: QwenVisionConfig = field(default_factory=QwenVisionConfig)
    text: QwenTextConfig = field(default_factory=QwenTextConfig)
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------


def rms_norm(x, scale, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    out = x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32)).astype(x.dtype)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        return rms_norm(x, scale, self.eps)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q, k, cos, sin):
    """q/k: (..., S, H, D); cos/sin broadcastable to (..., S, 1, D).
    Computed in f32 (HF forces float here)."""
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    cos = cos.astype(jnp.float32)
    sin = sin.astype(jnp.float32)
    q_out = qf * cos + _rotate_half(qf) * sin
    k_out = kf * cos + _rotate_half(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------


def vision_rope_cos_sin(grid_thw: Sequence[Tuple[int, int, int]],
                        head_dim: int, merge_size: int,
                        theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """(seq, head_dim) cos/sin for the 2D vision RoPE, tokens in
    merge-block order (matches Qwen3VLVisionModel.rot_pos_emb)."""
    dim_quarter = head_dim // 4
    inv_freq = 1.0 / theta ** (np.arange(0, dim_quarter, dtype=np.float32)
                               * 2 / (head_dim // 2))
    all_coords = []
    for t, h, w in grid_thw:
        mh, mw = h // merge_size, w // merge_size
        # full-resolution (row, col) in merge-block token order
        block_rows = np.arange(mh)
        block_cols = np.arange(mw)
        intra = np.arange(merge_size)
        row_idx = (block_rows[:, None, None, None] * merge_size
                   + intra[None, None, :, None])
        col_idx = (block_cols[None, :, None, None] * merge_size
                   + intra[None, None, None, :])
        row_idx = np.broadcast_to(row_idx, (mh, mw, merge_size, merge_size)).reshape(-1)
        col_idx = np.broadcast_to(col_idx, (mh, mw, merge_size, merge_size)).reshape(-1)
        coords = np.stack([row_idx, col_idx], axis=-1)
        if t > 1:
            coords = np.tile(coords, (t, 1))
        all_coords.append(coords)
    coords = np.concatenate(all_coords, axis=0)          # (seq, 2)
    freqs = coords[:, :, None].astype(np.float32) * inv_freq[None, None, :]
    freqs = freqs.reshape(coords.shape[0], -1)           # (seq, head_dim/2)
    emb = np.concatenate([freqs, freqs], axis=-1)        # (seq, head_dim)
    return np.cos(emb), np.sin(emb)


def interpolated_pos_embed_indices(grid_thw: Sequence[Tuple[int, int, int]],
                                   num_grid_per_side: int, merge_size: int
                                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Bilinear interpolation of the (side x side) learned pos-embed
    table onto each grid, emitted in merge-block token order.  Returns
    (4, seq) int indices and (4, seq) float weights
    (matches fast_pos_embed_interpolate)."""
    idx_list = [[] for _ in range(4)]
    w_list = [[] for _ in range(4)]
    for t, h, w in grid_thw:
        h_idxs = np.linspace(0, num_grid_per_side - 1, h, dtype=np.float32)
        w_idxs = np.linspace(0, num_grid_per_side - 1, w, dtype=np.float32)
        h_floor = h_idxs.astype(np.int64)
        w_floor = w_idxs.astype(np.int64)
        h_ceil = np.clip(h_floor + 1, None, num_grid_per_side - 1)
        w_ceil = np.clip(w_floor + 1, None, num_grid_per_side - 1)
        dh = h_idxs - h_floor
        dw = w_idxs - w_floor
        base_h = h_floor * num_grid_per_side
        base_h_ceil = h_ceil * num_grid_per_side
        indices = [
            (base_h[:, None] + w_floor[None]).reshape(-1),
            (base_h[:, None] + w_ceil[None]).reshape(-1),
            (base_h_ceil[:, None] + w_floor[None]).reshape(-1),
            (base_h_ceil[:, None] + w_ceil[None]).reshape(-1),
        ]
        weights = [
            ((1 - dh)[:, None] * (1 - dw)[None]).reshape(-1),
            ((1 - dh)[:, None] * dw[None]).reshape(-1),
            (dh[:, None] * (1 - dw)[None]).reshape(-1),
            (dh[:, None] * dw[None]).reshape(-1),
        ]
        for i in range(4):
            idx_list[i].append(indices[i])
            w_list[i].append(weights[i])
    idx = np.stack([np.concatenate(x) for x in idx_list])
    wts = np.stack([np.concatenate(x) for x in w_list]).astype(np.float32)
    return idx, wts


def vision_segment_mask(grid_thw: Sequence[Tuple[int, int, int]]
                        ) -> Optional[np.ndarray]:
    """Additive block-diagonal attention mask (seq, seq): vision
    attention is confined to each frame (HF builds the same blocks via
    cu_seqlens).  Returns None when there is a single segment."""
    seg_ids = []
    sid = 0
    for t, h, w in grid_thw:
        for _ in range(t):
            seg_ids.extend([sid] * (h * w))
            sid += 1
    if sid <= 1:
        return None
    seg = np.asarray(seg_ids)
    return np.where(seg[:, None] == seg[None, :], 0.0,
                    -np.inf).astype(np.float32)


def permute_to_merge_order(flat: jnp.ndarray,
                           grid_thw: Sequence[Tuple[int, int, int]],
                           merge_size: int) -> jnp.ndarray:
    """Reorder per-image (t*h*w, D) row-major tokens into merge-block
    order (the pos-embed permute in fast_pos_embed_interpolate)."""
    outs = []
    offset = 0
    for t, h, w in grid_thw:
        n = h * w
        x = flat[offset:offset + n]
        x = jnp.tile(x, (t, 1))
        d = x.shape[-1]
        x = x.reshape(t, h // merge_size, merge_size, w // merge_size,
                      merge_size, d)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, d)
        outs.append(x)
        offset += n
    return jnp.concatenate(outs, axis=0)


def resolve_vision_attn_impl(cfg) -> str:
    """Static (trace-time) choice of the frame-batched attention
    lowering; see QwenVisionConfig.attn_impl."""
    impl = getattr(cfg, "attn_impl", "auto")
    if impl == "auto":
        return "scan" if jax.default_backend() == "tpu" else "einsum"
    return impl


class QwenVisionBlock(nn.Module):
    config: QwenVisionConfig

    @nn.compact
    def __call__(self, x, cos, sin, attn_mask=None):
        """``x`` is (seq, d) flat, or (frames, seq_per_frame, d) when
        the tower batches uniform frames — per-frame attention is then
        a batched einsum with NO (seq_total, seq_total) mask, the
        layout that keeps multi-image (audit evidence) prompts from
        materializing quadratic-in-total-patches f32 logits.  On TPU
        the frame-batched path lowers per frame under lax.map
        (cfg.attn_impl="scan") — one frame's 39 MB logits stay inside
        XLA's fusion window instead of round-tripping HBM, the
        measured bottleneck of batched vision forwards; 5x over both
        the batched einsum chain and the Pallas flash kernel
        (PERF_NOTES, BENCH_vision_attn.json)."""
        cfg = self.config
        d = x.shape[-1]
        S = x.shape[-2]
        lead = x.shape[:-2]
        h = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype, name="norm1")(x)
        q = nn.Dense(d, dtype=cfg.dtype, name="q_proj")(h)
        k = nn.Dense(d, dtype=cfg.dtype, name="k_proj")(h)
        v = nn.Dense(d, dtype=cfg.dtype, name="v_proj")(h)
        hd = cfg.head_dim
        q = q.reshape(lead + (S, cfg.num_heads, hd))
        k = k.reshape(lead + (S, cfg.num_heads, hd))
        v = v.reshape(lead + (S, cfg.num_heads, hd))
        q, k = apply_rope(q, k, cos[:, None, :], sin[:, None, :])
        impl = (resolve_vision_attn_impl(cfg)
                if attn_mask is None and len(lead) == 1 else "einsum")
        if impl == "flash":
            from emr2a_tpu.ops.vision_flash import frame_flash_attention
            attn = frame_flash_attention(q, k, v, hd ** -0.5)
        elif impl == "scan":
            def _one_frame(args):
                qf, kf, vf = args
                lg = jnp.einsum("qhd,khd->hqk", qf, kf,
                                preferred_element_type=jnp.float32) * hd ** -0.5
                pr = jax.nn.softmax(lg, axis=-1).astype(cfg.dtype)
                return jnp.einsum("hqk,khd->qhd", pr, vf)

            attn = jax.lax.map(_one_frame, (q, k, v))
        else:
            logits = jnp.einsum("...qhd,...khd->...hqk", q, k,
                                preferred_element_type=jnp.float32) * hd ** -0.5
            if attn_mask is not None:
                logits = logits + attn_mask[None, :, :]
            probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
            attn = jnp.einsum("...hqk,...khd->...qhd", probs, v)
        attn = attn.reshape(lead + (S, d))
        x = x + nn.Dense(d, dtype=cfg.dtype, name="o_proj")(attn)

        h = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype, name="norm2")(x)
        act = ACTIVATIONS[cfg.hidden_act]
        m = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(h)
        m = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(act(m))
        return x + m


class QwenPatchMerger(nn.Module):
    config: QwenVisionConfig
    use_postshuffle_norm: bool = False

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        merged_dim = cfg.hidden_size * cfg.spatial_merge_size ** 2
        if self.use_postshuffle_norm:
            x = x.reshape(-1, merged_dim)
            x = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype, name="norm")(x)
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype, name="norm")(x)
            x = x.reshape(-1, merged_dim)
        x = nn.Dense(merged_dim, dtype=cfg.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(cfg.out_hidden_size, dtype=cfg.dtype, name="fc2")(x)


class QwenVisionTower(nn.Module):
    """pixel patches (seq, patch_dim) + static grid_thw ->
    (merged tokens (seq/merge², out_hidden), deepstack list, taps)."""

    config: QwenVisionConfig

    @nn.compact
    def __call__(self, patches: jnp.ndarray,
                 grid_thw: Tuple[Tuple[int, int, int], ...],
                 tap_layers: Tuple[int, ...] = ()):
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="patch_embed")(patches)

        side = int(cfg.num_position_embeddings ** 0.5)
        idx, wts = interpolated_pos_embed_indices(grid_thw, side,
                                                  cfg.spatial_merge_size)
        table = self.param("pos_embed", nn.initializers.normal(0.02),
                           (cfg.num_position_embeddings, cfg.hidden_size))
        pos = (table[idx[0]] * wts[0][:, None] + table[idx[1]] * wts[1][:, None]
               + table[idx[2]] * wts[2][:, None] + table[idx[3]] * wts[3][:, None])
        pos = permute_to_merge_order(pos, grid_thw, cfg.spatial_merge_size)
        x = x + pos.astype(x.dtype)

        cos_np, sin_np = vision_rope_cos_sin(grid_thw, cfg.head_dim,
                                             cfg.spatial_merge_size)
        cos = jnp.asarray(cos_np)
        sin = jnp.asarray(sin_np)
        # Attention is confined to each frame (HF cu_seqlens
        # semantics).  Uniform multi-frame layouts — the audit evidence
        # package: N same-resolution CT slices per prompt — reshape to
        # (frames, seq_per_frame, d) and attend per frame as a batched
        # einsum: the f32 logits temp is frames * seq_f^2 instead of
        # the flat block-diagonal mask's (sum seq_f)^2, which grows
        # quadratically in image count and OOMs batched multimodal
        # prefill.  Mixed layouts keep the flat masked path.
        S_total = x.shape[0]
        # Uniformity must be on the (h, w) GRID, not the frame area:
        # equal-area mixed-aspect frames (e.g. 4x8 + 8x4) have
        # different 2D rope coordinate sequences, and the batched path
        # broadcasts the first frame's cos/sin rows to every frame.
        frame_hws = [(h, w) for t, h, w in grid_thw for _ in range(t)]
        uniform = (len(frame_hws) > 1
                   and len(set(frame_hws)) == 1)
        attn_mask = None
        if uniform:
            seq_f = frame_hws[0][0] * frame_hws[0][1]
            x = x.reshape(len(frame_hws), seq_f, cfg.hidden_size)
            # per-frame rope rows are identical across uniform frames
            cos, sin = cos[:seq_f], sin[:seq_f]
        else:
            mask_np = vision_segment_mask(grid_thw)
            attn_mask = (jnp.asarray(mask_np) if mask_np is not None
                         else None)

        deepstack = []
        taps = []
        for i in range(cfg.depth):
            x = QwenVisionBlock(cfg, name=f"block_{i}")(x, cos, sin, attn_mask)
            if i in cfg.deepstack_visual_indexes:
                j = cfg.deepstack_visual_indexes.index(i)
                # the merger's reshape(-1, merged_dim) collapses the
                # frame axis back to flat merge order
                deepstack.append(QwenPatchMerger(
                    cfg, use_postshuffle_norm=True,
                    name=f"deepstack_merger_{j}")(x))
            if i in tap_layers:
                taps.append(x.reshape(S_total, cfg.hidden_size))
        merged = QwenPatchMerger(cfg, use_postshuffle_norm=False,
                                 name="merger")(x)
        return merged, deepstack, taps


# ---------------------------------------------------------------------------
# Text model
# ---------------------------------------------------------------------------


def mrope_cos_sin(position_ids: jnp.ndarray, inv_freq: np.ndarray,
                  mrope_section: Tuple[int, int, int]
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """position_ids (3, B, S) -> cos/sin (B, S, head_dim) with
    interleaved t/h/w frequency layout (apply_interleaved_mrope)."""
    freqs = (position_ids[..., None].astype(jnp.float32)
             * jnp.asarray(inv_freq)[None, None, None, :])  # (3,B,S,hd/2)
    freqs_t = freqs[0]
    half = freqs.shape[-1]
    idx = np.arange(half)
    for dim, offset in ((1, 1), (2, 2)):
        length = mrope_section[dim] * 3
        sel = (idx >= offset) & (idx < length) & ((idx - offset) % 3 == 0)
        mask = jnp.asarray(sel)
        freqs_t = jnp.where(mask[None, None, :], freqs[dim], freqs_t)
    emb = jnp.concatenate([freqs_t, freqs_t], axis=-1)  # (B,S,head_dim)
    return jnp.cos(emb), jnp.sin(emb)


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(batch, position, head) absmax int8 quantization of fresh
    K/V rows: (B, S, KV, HD) -> (s8 values, f32 scales (B, S, KV)).

    Halves the KV-cache HBM stream and residency vs bf16; the scales
    are folded into the attention math (K scales onto the logits, V
    scales onto the probs) so the big einsums read s8 straight from
    HBM with no materialized dequantized cache."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = jnp.maximum(a / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, s


def cache_write(buf: jnp.ndarray, fresh: jnp.ndarray, cache_pos):
    """Write ``fresh`` (B, S, ...) into ``buf`` (B, L, ...) at position
    offset ``cache_pos`` — a traced scalar (all rows share the offset:
    the plain prefill/decode path, lowered as dynamic_update_slice) or
    a traced (B,) vector (per-row offsets: continuous-batching slots
    each at their own generation depth, lowered as a scatter; rows
    whose window would run past L are dropped by XLA's out-of-bounds
    scatter semantics, never wrapped)."""
    pos = jnp.asarray(cache_pos)
    if pos.ndim == 1:
        B, S = fresh.shape[0], fresh.shape[1]
        rows = jnp.arange(B)[:, None]
        cols = pos[:, None] + jnp.arange(S)[None, :]
        return buf.at[rows, cols].set(fresh.astype(buf.dtype),
                                      mode="drop")
    start = (0, cache_pos) + (0,) * (buf.ndim - 2)
    return jax.lax.dynamic_update_slice(buf, fresh.astype(buf.dtype),
                                        start)


class QwenTextDecoderLayer(nn.Module):
    config: QwenTextConfig

    def _dense(self, name: str, features: int, use_bias: bool, h):
        """nn.Dense, or a streaming quantized kernel when this layer's
        params carry quantized weights (quantize_qwen_text_params) —
        decode is weight-bandwidth-bound; W8 halves the stream
        (ops/linear_int8.py) and W4 halves it again
        (ops/linear_int4.py, group-wise 4-bit)."""
        if not self.is_initializing():
            params = self.variables["params"].get(name)
            if params is not None and "kernel_p4" in params:
                from emr2a_tpu.ops.linear_int4 import linear_w4a8
                return linear_w4a8(
                    h, params["kernel_p4"], params["kernel_scale4"],
                    params.get("bias"),
                    out_dtype=self.config.dtype,
                    interpret=jax.default_backend() != "tpu")
            if params is not None and "kernel_q" in params:
                from emr2a_tpu.ops.linear_int8 import linear_w8a8
                return linear_w8a8(
                    h, params["kernel_q"], params["kernel_scale"],
                    params.get("bias"),
                    out_dtype=self.config.dtype,
                    interpret=jax.default_backend() != "tpu")
        return nn.Dense(features, use_bias=use_bias,
                        dtype=self.config.dtype, name=name)(h)

    def _sow_awq(self, name: str, t):
        """Per-channel activation stats for AWQ calibration
        (models/awq.py): sown only when the caller makes the
        ``intermediates`` collection mutable, so the serving path pays
        nothing.  Stacks (amax, mean-square) over all leading dims."""
        if self.is_mutable_collection("intermediates"):
            a = jnp.abs(t.astype(jnp.float32)).reshape(-1, t.shape[-1])
            self.sow("intermediates", name,
                     jnp.stack([a.max(axis=0), jnp.mean(a * a, axis=0)]))

    @nn.compact
    def __call__(self, x, cos, sin, cache_kv, cache_pos, attn_mask):
        """x: (B, S, D). cache_kv: None or (k, v) with shape
        (B, L, KV, HD); cache_pos: starting write offset (traced).
        attn_mask: (B, S, L_total) additive f32.
        Returns (x, new_cache_kv)."""
        cfg = self.config
        B, S, d = x.shape
        hd = cfg.head_dim

        h = RMSNorm(cfg.rms_norm_eps, name="input_ln")(x)
        self._sow_awq("awq_qkv_in", h)
        nq, nkv = cfg.num_heads * hd, cfg.num_kv_heads * hd
        if (not self.is_initializing()
                and self.variables["params"].get("qkv_proj") is not None):
            # fused serving layout (quantize_qwen_text_params
            # fuse_projs=True): one dispatch + one activation quantize
            # for q/k/v
            qkv = self._dense("qkv_proj", nq + 2 * nkv,
                              cfg.attention_bias, h)
            q, k, v = (qkv[..., :nq], qkv[..., nq:nq + nkv],
                       qkv[..., nq + nkv:])
        else:
            q = self._dense("q_proj", nq, cfg.attention_bias, h)
            k = self._dense("k_proj", nkv, cfg.attention_bias, h)
            v = self._dense("v_proj", nkv, cfg.attention_bias, h)
        q = q.reshape(B, S, cfg.num_heads, hd)
        k = k.reshape(B, S, cfg.num_kv_heads, hd)
        v = v.reshape(B, S, cfg.num_kv_heads, hd)

        # per-head-dim RMS norms (Qwen3 style)
        q_scale = self.param("q_norm_scale", nn.initializers.ones, (hd,))
        k_scale = self.param("k_norm_scale", nn.initializers.ones, (hd,))
        q = rms_norm(q, q_scale, cfg.rms_norm_eps)
        k = rms_norm(k, k_scale, cfg.rms_norm_eps)

        q, k = apply_rope(q, k, cos[:, :, None, :], sin[:, :, None, :])

        kq_scale = vq_scale = None  # (B, L, KV) f32, s8-KV quant scales
        if cache_kv is not None and len(cache_kv) == 4:
            # int8 KV cache: quantize the fresh rows at write time and
            # keep the cache s8 end-to-end (scales folded in below).
            ck, cks, cv, cvs = cache_kv
            k_q, k_s = quantize_kv(k)
            v_q, v_s = quantize_kv(v)
            ck = cache_write(ck, k_q, cache_pos)
            cks = cache_write(cks, k_s, cache_pos)
            cv = cache_write(cv, v_q, cache_pos)
            cvs = cache_write(cvs, v_s, cache_pos)
            k_all, v_all = ck, cv
            kq_scale, vq_scale = cks, cvs
            new_cache = (ck, cks, cv, cvs)
        elif cache_kv is not None:
            ck, cv = cache_kv
            ck = cache_write(ck, k, cache_pos)
            cv = cache_write(cv, v, cache_pos)
            k_all, v_all = ck, cv
            new_cache = (ck, cv)
        else:
            k_all, v_all = k, v
            new_cache = None

        # GQA dual path (S is static per trace, so this branch picks
        # one lowering per compile).  Decode (small S): grouped einsum
        # against the UN-repeated cache — a materialized jnp.repeat
        # would write+re-read groups x the whole KV cache from HBM
        # every decode step (at 8B/B=8 that is ~10 GB/step; measured
        # 229 -> 589 tok/s aggregate without it).  Prefill (large S):
        # the repeat is amortized over S and the flat 4-D einsum tiles
        # better than the grouped 5-D one (measured 1025 -> 941 ms at
        # 8B/B=8/T=1024), so keep it there.
        groups = cfg.num_heads // cfg.num_kv_heads
        if S <= 16:  # decode / small-suffix trace
            q_g = q.reshape(B, S, cfg.num_kv_heads, groups, hd)
            logits = jnp.einsum(
                "bqkgd,blkd->bkgql", q_g, k_all,
                preferred_element_type=jnp.float32) * hd ** -0.5
            if kq_scale is not None:  # fold s8-cache K scales in
                logits = logits * kq_scale.transpose(0, 2, 1)[:, :, None,
                                                             None, :]
            logits = logits + attn_mask[:, None, None, :, :]
            probs = jax.nn.softmax(logits, axis=-1)
            if vq_scale is not None:  # fold V scales into the probs
                probs = probs * vq_scale.transpose(0, 2, 1)[:, :, None,
                                                           None, :]
            probs = probs.astype(cfg.dtype)
            attn = jnp.einsum("bkgql,blkd->bqkgd", probs, v_all)
        else:  # prefill trace
            k_rep = jnp.repeat(k_all, groups, axis=2)
            v_rep = jnp.repeat(v_all, groups, axis=2)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k_rep,
                preferred_element_type=jnp.float32) * hd ** -0.5
            if kq_scale is not None:
                ks_rep = jnp.repeat(kq_scale, groups, axis=2)
                logits = logits * ks_rep.transpose(0, 2, 1)[:, :, None, :]
            logits = logits + attn_mask[:, None, :, :]
            probs = jax.nn.softmax(logits, axis=-1)
            if vq_scale is not None:
                vs_rep = jnp.repeat(vq_scale, groups, axis=2)
                probs = probs * vs_rep.transpose(0, 2, 1)[:, :, None, :]
            probs = probs.astype(cfg.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v_rep)
        attn = attn.reshape(B, S, cfg.num_heads * hd)
        self._sow_awq("awq_o_in", attn)
        x = x + self._dense("o_proj", d, cfg.attention_bias, attn)

        h = RMSNorm(cfg.rms_norm_eps, name="post_ln")(x)
        self._sow_awq("awq_gu_in", h)
        act = ACTIVATIONS[cfg.hidden_act]
        I = cfg.intermediate_size
        if (not self.is_initializing()
                and self.variables["params"].get("gate_up_proj") is not None):
            gu = self._dense("gate_up_proj", 2 * I, False, h)
            gate, up = gu[..., :I], gu[..., I:]
        else:
            gate = self._dense("gate_proj", I, False, h)
            up = self._dense("up_proj", I, False, h)
        hu = act(gate) * up
        self._sow_awq("awq_down_in", hu)
        down = self._dense("down_proj", d, False, hu)
        return x + down, new_cache


class QwenTextModel(nn.Module):
    config: QwenTextConfig

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                     dtype=cfg.dtype, name="embed_tokens")
        self.layers = [QwenTextDecoderLayer(cfg, name=f"layer_{i}")
                       for i in range(cfg.num_layers)]
        self.final_ln = RMSNorm(cfg.rms_norm_eps, name="final_ln")
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False,
                                    dtype=cfg.dtype, name="lm_head")

    @property
    def inv_freq(self) -> np.ndarray:
        cfg = self.config
        return 1.0 / cfg.rope_theta ** (
            np.arange(0, cfg.head_dim, 2, dtype=np.float32) / cfg.head_dim)

    def __call__(self, inputs_embeds, position_ids, cache=None, cache_pos=0,
                 attn_mask=None, visual_mask=None, deepstack=None,
                 visual_gather_idx=None, return_hidden: bool = False):
        """inputs_embeds (B,S,D); position_ids (3,B,S); cache: list of
        per-layer (k,v) or None; attn_mask (B,S,L) additive.
        ``visual_gather_idx`` (B,S) overrides the in-call cumsum gather
        into the deepstack table — chunked prefill passes a slice of the
        full-prompt index (the cumsum must not restart per chunk).
        Returns (logits_or_hidden, new_cache)."""
        cfg = self.config
        x = inputs_embeds
        cos, sin = mrope_cos_sin(position_ids, self.inv_freq,
                                 cfg.mrope_section)
        if attn_mask is None:
            B, S, _ = x.shape
            q_idx = jnp.arange(S)[:, None]
            k_idx = jnp.arange(S)[None, :]
            attn_mask = jnp.where(k_idx <= q_idx, 0.0, -jnp.inf)[None].astype(jnp.float32)
            attn_mask = jnp.broadcast_to(attn_mask, (B, S, S))

        new_cache = []
        n_deep = len(deepstack) if deepstack else 0
        for i, layer in enumerate(self.layers):
            x, layer_cache = layer(x, cos, sin,
                                   cache[i] if cache is not None else None,
                                   cache_pos, attn_mask)
            new_cache.append(layer_cache)
            if i < n_deep and visual_mask is not None:
                # add deepstack features at visual token positions:
                # gather rows by cumsum index, mask off text positions.
                ds = deepstack[i]  # (n_visual, D)
                gather_idx = (visual_gather_idx
                              if visual_gather_idx is not None else
                              visual_gather_indices(visual_mask, ds.shape[0]))
                add = ds[gather_idx]  # (B, S, D)
                x = x + jnp.where(visual_mask[..., None],
                                  add.astype(x.dtype), 0)

        x = self.final_ln(x)
        if return_hidden:
            return x, new_cache
        return self.project(x), new_cache

    def project(self, hidden):
        """Vocabulary projection; exposed so callers can project only
        the positions they need (e.g. the last prompt token)."""
        if self.config.tie_word_embeddings:
            return hidden @ self.embed_tokens.embedding.T.astype(hidden.dtype)
        # untied lm_head (8B geometry): W8 halves the decode stream of
        # the single largest weight (vocab 151936 x hidden)
        if not self.is_initializing():
            p = self.variables["params"].get("lm_head")
            if p is not None and "kernel_q" in p:
                from emr2a_tpu.ops.linear_int8 import linear_w8a8
                return linear_w8a8(
                    hidden, p["kernel_q"], p["kernel_scale"], None,
                    out_dtype=self.config.dtype,
                    interpret=jax.default_backend() != "tpu")
        return self.lm_head(hidden)


# ---------------------------------------------------------------------------
# Full model + generation
# ---------------------------------------------------------------------------


# Per-layer f32 vision attention-logits budget (heads x frames x
# seq_f^2 in the uniform batched path).  1 GiB keeps a B=16 x 7-image
# 448^2 audit prefill inside single-chip HBM next to the 8B W8A8
# persistent set; the cost of a smaller budget is one extra vision
# weight re-read per group, which is noise next to the temp it avoids.
_VISION_TEMP_BUDGET = 1 * 2**30


def plan_vision_groups(vision_cfg, grid_thw,
                       budget: int = None) -> Optional[list]:
    """Split a many-image forward into image groups whose attention
    temps fit ``budget`` bytes, or None for the one-shot call.

    Returns [(img_lo, img_hi, patch_lo, patch_hi), ...] over the
    grid_thw entries.  Splits only at image boundaries — vision
    attention never crosses a frame, so grouping is exact.  Only
    uniform layouts group (mixed-resolution corpora pin their grids
    via standardize_images before batched serving matters)."""
    if budget is None:
        budget = _VISION_TEMP_BUDGET
    if len(grid_thw) <= 1:
        return None
    # The group patch offsets below assume a constant patches_per_img,
    # so t must be uniform too — a video entry mixed with single-frame
    # images at one resolution would misalign every later group slice.
    if len({(t, h, w) for t, h, w in grid_thw}) != 1:
        return None
    t0, h0, w0 = grid_thw[0]
    seq_f = h0 * w0
    per_frame = vision_cfg.num_heads * seq_f * seq_f * 4
    total_frames = sum(t for t, _, _ in grid_thw)
    if total_frames * per_frame <= budget:
        return None
    frames_per_img = grid_thw[0][0]
    imgs_per_group = max(1, budget // (per_frame * max(1, frames_per_img)))
    groups = []
    patches_per_img = t0 * seq_f
    for lo in range(0, len(grid_thw), imgs_per_group):
        hi = min(lo + imgs_per_group, len(grid_thw))
        groups.append((lo, hi, lo * patches_per_img, hi * patches_per_img))
    return groups


def visual_gather_indices(mask: jnp.ndarray, table_len: int) -> jnp.ndarray:
    """Gather indices into the flat batch image-token table.

    ``mask`` (B, S) marks image-token positions.  The table concatenates
    every row's image tokens in batch order, so row ``b``'s k-th image
    token reads ``table[offset_b + k]`` where ``offset_b`` counts image
    tokens in rows < b.  (B=1 reduces to the plain per-row cumsum.)
    """
    counts = mask.sum(axis=-1)
    offsets = jnp.cumsum(counts) - counts  # (B,)
    idx = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1 + offsets[:, None]
    return jnp.clip(idx, 0, table_len - 1)


class Qwen3VLModel(nn.Module):
    """Multimodal forward: ids + optional image patches -> logits."""

    config: Qwen3VLConfig

    def setup(self):
        self.visual = QwenVisionTower(self.config.vision, name="visual")
        self.language_model = QwenTextModel(self.config.text,
                                            name="language_model")

    def embed_multimodal(self, input_ids, pixel_patches, grid_thw):
        """Token embeddings with image embeddings spliced at
        image-token positions; returns (embeds, visual_mask, deepstack).

        The flat image-token table concatenates every row's image
        tokens in batch order (HF row-major semantics), so batched
        rows may carry distinct images/grids.

        Many-image prompts (batched audit serving: B cases x ~7
        evidence images) run the vision tower in image GROUPS sized so
        the per-layer attention-logits temp stays under a budget —
        vision attention is frame-local, so group-wise calls are
        EXACTLY the one-shot forward (parity pinned in
        tests/test_qwen3_vl_parity.py), and the only cost is re-reading
        the vision weights (~0.8 GiB bf16 at 8B) once per extra group —
        milliseconds against the multi-GiB temp it avoids."""
        embeds = self.language_model.embed_tokens(input_ids)
        if pixel_patches is None:
            return embeds, None, None
        groups = plan_vision_groups(self.config.vision, grid_thw)
        if groups is None:
            image_embeds, deepstack, _ = self.visual(pixel_patches,
                                                     grid_thw)
        else:
            emb_parts, deep_parts = [], None
            for img_lo, img_hi, p_lo, p_hi in groups:
                e, d, _ = self.visual(pixel_patches[p_lo:p_hi],
                                      grid_thw[img_lo:img_hi])
                emb_parts.append(e)
                if deep_parts is None:
                    deep_parts = [[x] for x in d]
                else:
                    for lvl, x in zip(deep_parts, d):
                        lvl.append(x)
            image_embeds = jnp.concatenate(emb_parts, axis=0)
            deepstack = [jnp.concatenate(lvl, axis=0)
                         for lvl in (deep_parts or [])]
        mask = input_ids == self.config.image_token_id  # (B,S)
        gather_idx = visual_gather_indices(mask, image_embeds.shape[0])
        spliced = image_embeds[gather_idx].astype(embeds.dtype)
        embeds = jnp.where(mask[..., None], spliced, embeds)
        return embeds, mask, deepstack

    def __call__(self, input_ids, position_ids, pixel_patches=None,
                 grid_thw=(), cache=None, cache_pos=0, attn_mask=None,
                 return_hidden: bool = False):
        embeds, visual_mask, deepstack = self.embed_multimodal(
            input_ids, pixel_patches, grid_thw)
        return self.language_model(
            embeds, position_ids, cache=cache, cache_pos=cache_pos,
            attn_mask=attn_mask, visual_mask=visual_mask,
            deepstack=deepstack, return_hidden=return_hidden)


def compute_mrope_position_ids(input_ids: np.ndarray,
                               grid_thw: Sequence[Tuple[int, int, int]],
                               image_token_id: int,
                               merge_size: int = 2) -> np.ndarray:
    """Host-side M-RoPE position ids (3, B, S) — text tokens advance
    all three axes together; each image block gets t/h/w grid positions
    (get_rope_index semantics, images only, no padding).  ``grid_thw``
    is consumed flat in batch-row-major order, matching the flat image
    table of ``Qwen3VLModel.embed_multimodal`` — batched rows may carry
    distinct image layouts."""
    B, S = input_ids.shape
    out = np.zeros((3, B, S), dtype=np.int64)
    img_i = 0
    for b in range(B):
        ids = input_ids[b]
        pos_chunks = []
        st = 0
        image_positions = np.where(ids == image_token_id)[0]
        # find contiguous image runs
        runs = []
        if len(image_positions):
            run_start = image_positions[0]
            prev = image_positions[0]
            for p in image_positions[1:]:
                if p != prev + 1:
                    runs.append((run_start, prev))
                    run_start = p
                prev = p
            runs.append((run_start, prev))
        for run_start, run_end in runs:
            text_len = run_start - st
            st_idx = pos_chunks[-1].max() + 1 if pos_chunks else 0
            if text_len > 0:
                pos_chunks.append(
                    np.broadcast_to(np.arange(text_len), (3, text_len)) + st_idx)
                st_idx = pos_chunks[-1].max() + 1
            t, h, w = grid_thw[img_i]
            img_i += 1
            gh, gw = h // merge_size, w // merge_size
            t_index = np.repeat(np.arange(t), gh * gw)
            h_index = np.tile(np.repeat(np.arange(gh), gw), t)
            w_index = np.tile(np.arange(gw), t * gh)
            pos_chunks.append(np.stack([t_index, h_index, w_index]) + st_idx)
            st = run_end + 1
        if st < S:
            st_idx = pos_chunks[-1].max() + 1 if pos_chunks else 0
            text_len = S - st
            pos_chunks.append(
                np.broadcast_to(np.arange(text_len), (3, text_len)) + st_idx)
        out[:, b, :] = np.concatenate(pos_chunks, axis=1)
    return out


# Sampling restricts to the top-k logits before the nucleus (top-p)
# filter — k=50 is the HF GenerationConfig default that the reference's
# model.generate calls inherit (llms/qwen3_llm.py:104-115,
# vlm_audit_module.py:338-343 never set top_k).  It is also what makes
# sampled decode cheap on TPU: one lax.top_k pass over the vocab
# instead of a full O(V log V) sort of 151,936 logits per step.
SAMPLE_TOP_K = 50


def sample_rows(logits: jnp.ndarray, keys, temp: jnp.ndarray,
                top_p: jnp.ndarray) -> jnp.ndarray:
    """Per-row temperature/top-k(50)/top-p sampling over (B, vocab)
    logits with per-row PRNG keys (B, 2); rows with temp <= 0 take the
    raw argmax (exactly the greedy path).  The ONE sampler shared by
    Qwen3VLGenerator and the continuous batcher — their parity
    contracts depend on the math living in a single place."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits.astype(jnp.float32) / jnp.maximum(temp, 1e-6)[:, None]
    k = min(SAMPLE_TOP_K, scaled.shape[-1])
    vals, idx = jax.lax.top_k(scaled, k)  # descending
    # nucleus filter: keep the smallest prefix of the sorted
    # distribution with cumulative mass >= top_p (always >= 1 kept;
    # top_p >= 1 keeps everything)
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = jnp.sum(cum - probs < top_p[:, None], axis=-1)
    cutoff = jnp.take_along_axis(vals, keep[:, None] - 1, axis=-1)
    filtered = jnp.where(vals < cutoff, -jnp.inf, vals)
    choice = jax.vmap(jax.random.categorical)(keys, filtered)
    sampled = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
    return jnp.where(temp <= 0, greedy, sampled.astype(jnp.int32))


def filtered_log_probs(logits: jnp.ndarray, temp: jnp.ndarray,
                       top_p: jnp.ndarray) -> jnp.ndarray:
    """Full-vocab (B, V) log-probabilities of the ``sample_rows``
    distribution: temperature-scaled, top-k(SAMPLE_TOP_K) and nucleus
    (top-p) filtered, -inf outside the kept support.  Rows with
    temp <= 0 degenerate to a point mass on the argmax — which makes
    rejection-sampling speculative acceptance (``spec_accept``) reduce
    EXACTLY to the greedy longest-matching-prefix rule for those rows
    (accept prob is 1 when the draft token is the target argmax, else
    0), so mixed greedy/sampled slots share one code path."""
    B, V = logits.shape
    scaled = logits.astype(jnp.float32) / jnp.maximum(temp, 1e-6)[:, None]
    k = min(SAMPLE_TOP_K, V)
    vals, idx = jax.lax.top_k(scaled, k)  # descending
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = jnp.sum(cum - probs < top_p[:, None], axis=-1)
    cutoff = jnp.take_along_axis(vals, keep[:, None] - 1, axis=-1)
    filtered = jnp.where(vals < cutoff, -jnp.inf, vals)
    lp_k = jax.nn.log_softmax(filtered, axis=-1)  # (B, k) kept support
    rows = jnp.arange(B)[:, None]
    full = jnp.full((B, V), -jnp.inf).at[rows, idx].set(lp_k)
    greedy = jnp.full((B, V), -jnp.inf).at[
        jnp.arange(B), jnp.argmax(logits, axis=-1)].set(0.0)
    return jnp.where((temp <= 0)[:, None], greedy, full)


def spec_accept(drafts: jnp.ndarray, q_lp: jnp.ndarray, p_lp: jnp.ndarray,
                keys: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Speculative rejection-sampling acceptance (the lossless scheme):
    accept draft x_j with prob min(1, p_j(x_j)/q_j(x_j)); at the first
    rejection sample the correction from normalize(max(p_j - q_j, 0));
    when all k drafts are accepted sample the bonus token from p_k.
    The emitted prefix is then distributed EXACTLY as sampling from the
    target alone (pinned statistically by
    tests/test_sampled_speculative.py); with point-mass greedy
    distributions it reduces to the longest argmax-matching prefix.

    drafts (B, k) proposals sampled from q; q_lp (B, k, V) draft
    log-probs per proposal position; p_lp (B, k+1, V) target log-probs;
    keys (B, 2) per-row PRNG keys.  Returns (emitted (B, k+1) int32,
    n_acc (B,)): emitted[:, :n_acc] are the accepted drafts,
    emitted[:, n_acc] the correction/bonus — the cycle's verified
    emission is emitted[:, :n_acc + 1]."""
    B, k = drafts.shape
    split = jax.vmap(jax.random.split)(keys)  # (B, 2, 2)
    u_key, c_key = split[:, 0], split[:, 1]
    u = jax.vmap(lambda kk: jax.random.uniform(kk, (k,)))(u_key)  # (B, k)
    p_at = jnp.take_along_axis(p_lp[:, :k], drafts[:, :, None],
                               axis=2)[..., 0]
    q_at = jnp.take_along_axis(q_lp, drafts[:, :, None], axis=2)[..., 0]
    # q_at is finite (drafts were sampled from q's support), so the
    # ratio never hits -inf - -inf; p_at = -inf gives accept prob 0.
    accept = u < jnp.exp(jnp.minimum(p_at - q_at, 0.0))  # (B, k)
    acc_i = accept.astype(jnp.int32)
    n_acc = jnp.argmin(jnp.cumprod(acc_i, axis=1), axis=1)
    n_acc = jnp.where(accept.all(axis=1), k, n_acc)
    p_n = jnp.take_along_axis(p_lp, n_acc[:, None, None], axis=1)[:, 0]
    q_n = jnp.take_along_axis(q_lp, jnp.minimum(n_acc, k - 1)[:, None, None],
                              axis=1)[:, 0]
    resid = jnp.maximum(jnp.exp(p_n) - jnp.exp(q_n), 0.0)  # (B, V)
    # all-zero residual is possible only through underflow (exact
    # rejection implies p(x) < q(x) somewhere, so p > q elsewhere);
    # fall back to p itself rather than emit NaN.
    has_resid = resid.sum(axis=-1, keepdims=True) > 0
    corr_lp = jnp.where(n_acc[:, None] == k, p_n,
                        jnp.where(has_resid, jnp.log(resid), p_n))
    correction = jax.vmap(jax.random.categorical)(c_key, corr_lp)
    emitted = jnp.concatenate(
        [drafts, jnp.zeros((B, 1), drafts.dtype)], axis=1)
    emitted = jnp.where(jnp.arange(k + 1)[None, :] == n_acc[:, None],
                        correction[:, None].astype(drafts.dtype), emitted)
    return emitted.astype(jnp.int32), n_acc


def empty_kv_cache(text_cfg, batch: int, max_len: int, kv_dtype: str):
    """Static KV cache for scan decode — the ONE allocator shared by
    the plain/speculative generators and the continuous batcher (the
    tuple layout must match quantize_kv / cache_write everywhere)."""
    kv_shape = (batch, max_len, text_cfg.num_kv_heads, text_cfg.head_dim)
    if kv_dtype == "int8":
        # s8 values + per-(b, pos, head) f32 scales (quantize_kv):
        # halves KV residency/stream vs bf16
        return [
            (jnp.zeros(kv_shape, jnp.int8),
             jnp.zeros(kv_shape[:3], jnp.float32),
             jnp.zeros(kv_shape, jnp.int8),
             jnp.zeros(kv_shape[:3], jnp.float32))
            for _ in range(text_cfg.num_layers)]
    return [(jnp.zeros(kv_shape, text_cfg.dtype),
             jnp.zeros(kv_shape, text_cfg.dtype))
            for _ in range(text_cfg.num_layers)]


def kv_cache_sharding_specs(text_cfg, mesh, axis: str = "model"):
    """(values_spec, scales_spec) for the KV cache under tensor
    parallelism: K/V value buffers (B, L, KV, HD) shard the kv-head
    axis over the mesh ``axis`` — the same axis the q/k/v projection
    columns shard on (training/sharding_rules.py), so the cache lives
    next to the heads that read it and decode attention needs no
    collective.  int8-mode scale buffers (B, L, KV) shard likewise.
    When ``axis`` does not divide num_kv_heads the cache stays
    replicated (weight-only TP still applies; the 8B judge's 8 KV
    heads divide every power-of-2 axis up to 8)."""
    from jax.sharding import PartitionSpec as P
    n = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1) \
        if mesh is not None else 1
    if n <= 1 or text_cfg.num_kv_heads % n:
        return P(), P()
    return P(None, None, axis, None), P(None, None, axis)


def constrain_kv_cache(cache, mesh, text_cfg, axis: str = "model"):
    """Anchor the KV cache's sharding: with_sharding_constraint over
    every buffer (no-op without a mesh).  Placed where caches are
    created / enter a program so XLA's SPMD propagation keeps the
    multi-GiB serving cache head-sharded instead of falling back to
    replication."""
    if mesh is None:
        return cache
    from jax.sharding import NamedSharding
    val, scale = kv_cache_sharding_specs(text_cfg, mesh, axis)

    def c(buf):
        spec = val if buf.ndim == 4 else scale
        return jax.lax.with_sharding_constraint(
            buf, NamedSharding(mesh, spec))

    return [tuple(c(b) for b in layer) for layer in cache]


def chunked_prefill(model: Qwen3VLModel, params, input_ids, position_ids,
                    true_len, pixel_patches, grid_thw, padded_len: int,
                    max_len: int, cache, C: int, start: int = 0):
    """Sequence-chunked prefill: embed the full prompt once (the
    visual splice and deepstack gather are whole-prompt cumsums), then
    ``lax.scan`` the decoder over padded_len/C chunks, each writing
    its KV rows at ``cache_pos = start + chunk_index * C``.

    ``start > 0`` prefills a SUFFIX behind an already-filled cache
    region [0, start) — the shared-prefix serving path
    (models/serving.py): ``input_ids``/``position_ids`` then cover
    only positions [start, start + padded_len) and ``true_len`` stays
    the full unpadded sequence length, so the causal mask admits the
    prefix keys exactly as a whole-prompt prefill would.

    Numerically identical to the one-shot prefill
    (tests/test_qwen3_vl_parity.py): each chunk's queries attend the
    same masked key set (later cache rows are -inf-masked zeros either
    way), so logits, softmax and the s8 KV quantization see identical
    inputs.  What changes is the temp footprint — the per-layer
    (B, heads, S, L) f32 attention logits become (B, heads, C, L), the
    term that OOMs B>=16 batched or long-bucket prefill — and the
    weight traffic (each chunk re-reads the decoder weights).
    Returns (hidden (B, padded_len, D), cache)."""
    if padded_len % C:
        raise ValueError(
            f"prefill_chunk {C} must divide the prompt bucket "
            f"{padded_len}")
    n = padded_len // C
    B = input_ids.shape[0]
    embeds, visual_mask, deepstack = model.apply(
        {"params": params}, input_ids, pixel_patches, grid_thw,
        method=Qwen3VLModel.embed_multimodal)
    vg_full = None
    if visual_mask is not None and deepstack:
        vg_full = visual_gather_indices(visual_mask, deepstack[0].shape[0])
    D = embeds.shape[-1]
    xs = {"emb": embeds.reshape(B, n, C, D).swapaxes(0, 1),  # (n, B, C, D)
          "pos": position_ids.reshape(3, B, n, C).transpose(2, 0, 1, 3),
          "ci": jnp.arange(n, dtype=jnp.int32)}
    if visual_mask is not None:
        xs["vm"] = visual_mask.reshape(B, n, C).swapaxes(0, 1)
        if vg_full is not None:
            xs["vg"] = vg_full.reshape(B, n, C).swapaxes(0, 1)
    k_idx = jnp.arange(max_len)[None, None, :]

    def chunk_step(cache, x):
        q_abs = start + x["ci"] * C + jnp.arange(C)
        mask = jnp.where(
            (k_idx <= q_abs[None, :, None])
            & (k_idx < true_len[:, None, None]),
            0.0, -jnp.inf).astype(jnp.float32)  # (B, C, max)
        hidden_c, cache = model.apply(
            {"params": params}, x["emb"], x["pos"], cache=cache,
            cache_pos=start + x["ci"] * C, attn_mask=mask,
            visual_mask=x.get("vm"), deepstack=deepstack,
            visual_gather_idx=x.get("vg"), return_hidden=True,
            method=lambda m, *a, **kw: m.language_model(*a, **kw))
        return cache, hidden_c

    cache, hidden = jax.lax.scan(chunk_step, cache, xs)
    # (n, B, C, D) -> (B, S, D)
    hidden = hidden.swapaxes(0, 1).reshape(B, padded_len, D)
    return hidden, cache


# Per-layer f32 attention-temp budget for one-shot prefill.  2 GiB is
# conservative on purpose: the persistent set (8B W8A8 params 8.79 GiB
# + batched s8 KV) leaves only ~4-5 GiB of HBM headroom at the large-
# batch shapes where chunking matters, and at this budget auto
# reproduces exactly the measured-good configs — C=256 at B=32 @
# bucket 1024 and at B=8 @ bucket 4096 (PERF_NOTES).  Over-chunking
# costs only extra weight re-reads that hide under batched compute
# (B=32 chunked prefill measured linear per case); under-chunking
# OOMs, so the budget errs small.
_PREFILL_TEMP_BUDGET = 2 * 2**30


def auto_prefill_chunk(batch: int, num_heads: int, padded_len: int,
                       max_len: int,
                       budget: Optional[int] = None) -> Optional[int]:
    """Pick a prefill chunk so the per-layer ``(B, heads, C, max_len)``
    f32 attention temp stays under ``budget`` bytes, or ``None`` when
    the one-shot prefill already fits.  Callers use this when the user
    gave no explicit ``prefill_chunk``, so large batches / long prompt
    buckets serve without knowing the flag instead of OOMing mid-
    prefill.  The chunk must divide the bucket (the chunked prefill is
    a ``lax.scan`` over equal slices), so this picks the largest
    divisor of ``padded_len`` that fits — not just repeated halving,
    which would stop at the first odd divisor of a non-power-of-two
    bucket even when still over budget."""
    if budget is None:
        budget = _PREFILL_TEMP_BUDGET
    per_row = batch * num_heads * max_len * 4
    if padded_len * per_row <= budget:
        return None
    best = 1
    for d in range(1, int(padded_len ** 0.5) + 1):
        if padded_len % d:
            continue
        for c in (d, padded_len // d):
            if best < c < padded_len and c * per_row <= budget:
                best = c
    if best * per_row > budget:
        import logging
        logging.getLogger(__name__).warning(
            "auto_prefill_chunk: even chunk=1 exceeds the %d-byte temp "
            "budget (B=%d heads=%d max_len=%d); proceeding with 1 — "
            "expect HBM pressure", budget, batch, num_heads, max_len)
    return best


class Qwen3VLGenerator:
    """Prefill + scan-decode greedy/sampled generation over a static
    KV cache.  One compile per (prompt bucket, max_new_tokens)."""

    def __init__(self, model: Qwen3VLModel, params, max_new_tokens: int = 1024,
                 eos_token_id: int = 151645, kv_dtype: str = "bf16",
                 prefill_chunk: Optional[int] = None, mesh=None):
        """``mesh``: serve tensor-parallel over a jax.sharding.Mesh —
        the bf16-8B mode (16.1 GiB params exceed one v5e).  The caller
        shards ``params`` over the mesh ``model`` axis
        (training/sharding_rules.param_shardings + device_put); the
        generator then anchors the KV cache on the kv-head axis
        (kv_cache_sharding_specs) so decode attention reads local
        heads and only the o_proj/down_proj all-reduces cross ICI.
        Token streams are identical to the single-device path
        (tests/test_serving_tp.py).  The reference's nearest feature
        is HF device_map="auto" layer placement
        (/root/reference/encoders/qwen3_vl_8b_thinking_encoder.py:34);
        this is real tensor parallelism instead."""
        self.model = model
        self.params = params
        self.config = model.config
        self.max_new_tokens = max_new_tokens
        self.eos_token_id = eos_token_id
        if kv_dtype not in ("bf16", "int8"):
            raise ValueError(f"kv_dtype must be bf16 or int8: {kv_dtype}")
        self.kv_dtype = kv_dtype
        # Chunked prefill: run the prompt through the decoder in
        # prefill_chunk-token slices (lax.scan) instead of one full-S
        # pass.  Bounds the per-layer (B, heads, S, L) f32 attention
        # temps to (B, heads, chunk, L) — the term that OOMs batched
        # (B>=16) or long-bucket prefill — at the cost of re-reading
        # the weights once per chunk.  None = auto: chunk only when
        # the one-shot temps would blow the budget (auto_prefill_chunk).
        self.prefill_chunk = prefill_chunk
        self.mesh = mesh
        self._jitted: Dict = {}

    def _empty_cache(self, batch: int, max_len: int):
        return constrain_kv_cache(
            empty_kv_cache(self.config.text, batch, max_len,
                           self.kv_dtype),
            self.mesh, self.config.text)

    def _sampler(self, temperature: float, top_p: float):
        def sample(logits_last, key):
            if temperature <= 0:
                return jnp.argmax(logits_last, axis=-1)
            # delegate to the shared per-row sampler (top-k=50 prefilter
            # + nucleus) with the scalar config broadcast per row
            B = logits_last.shape[0]
            keys = jax.random.split(key, B)
            return sample_rows(
                logits_last, keys,
                jnp.full((B,), temperature, jnp.float32),
                jnp.full((B,), top_p, jnp.float32))

        return sample

    def _prefill_math(self, params, input_ids, position_ids, true_len,
                      pixel_patches, grid_thw, padded_len: int,
                      max_len: int):
        """Prefill over the padded prompt: causal AND key < true_len
        (right padding never receives attention mass).  true_len is
        per-row (B,) so one batch may mix prompt lengths.  Returns
        (cache, last-position logits, per-row next rope position)."""
        B = input_ids.shape[0]
        cache = self._empty_cache(B, max_len)
        C = self.prefill_chunk
        if C is None:
            # no explicit chunk: auto-chunk iff one-shot would OOM
            C = auto_prefill_chunk(B, self.config.text.num_heads,
                                   padded_len, max_len)
        if C and padded_len > C:
            hidden, cache = self._prefill_chunked(
                params, input_ids, position_ids, true_len, pixel_patches,
                grid_thw, padded_len, max_len, cache, C)
        else:
            q_idx = jnp.arange(padded_len)[None, :, None]
            k_idx = jnp.arange(max_len)[None, None, :]
            mask = jnp.where(
                (k_idx <= q_idx) & (k_idx < true_len[:, None, None]),
                0.0, -jnp.inf).astype(jnp.float32)  # (B, padded, max)
            hidden, cache = self.model.apply(
                {"params": params}, input_ids, position_ids,
                pixel_patches=pixel_patches, grid_thw=grid_thw,
                cache=cache, cache_pos=0, attn_mask=mask,
                return_hidden=True)
        # Project ONLY the last true prompt position of each row to
        # the vocab (full-prompt logits would materialize (B, S, vocab)).
        last_hidden = hidden[jnp.arange(B), true_len - 1]  # (B, D)
        last_logits = self.model.apply(
            {"params": params}, last_hidden,
            method=lambda m, h: m.language_model.project(h))
        # per-row next position (rows may have different content)
        next_pos_base = position_ids.max(axis=(0, 2)) + 1  # (B,)
        return cache, last_logits, next_pos_base

    def _prefill_chunked(self, params, input_ids, position_ids, true_len,
                         pixel_patches, grid_thw, padded_len: int,
                         max_len: int, cache, C: int):
        return chunked_prefill(self.model, params, input_ids,
                               position_ids, true_len, pixel_patches,
                               grid_thw, padded_len, max_len, cache, C)

    def _decode_step(self, params, padded_len: int, max_len: int, sample,
                     true_len, next_pos_base):
        B = true_len.shape[0]

        def step(carry, _):
            cache, token, step_i, key, done = carry
            key, sub = jax.random.split(key)
            pos = jnp.broadcast_to(
                (next_pos_base + step_i)[None, :, None], (3, B, 1))
            k_idx = jnp.arange(max_len)[None, None, :]
            # attend to each row's true prompt + generated tokens
            mask = jnp.where(
                (k_idx < true_len[:, None, None])
                | ((k_idx >= padded_len) & (k_idx <= padded_len + step_i)),
                0.0, -jnp.inf).astype(jnp.float32)  # (B, 1, max)
            logits, cache = self.model.apply(
                {"params": params}, token[:, None], pos,
                cache=cache, cache_pos=padded_len + step_i,
                attn_mask=mask)
            nxt = sample(logits[:, -1], sub)
            done = done | (token == self.eos_token_id)
            nxt = jnp.where(done, self.eos_token_id, nxt)
            return (cache, nxt, step_i + 1, key, done), token

        return step

    def _build(self, padded_len: int, grid_thw, max_new: int,
               temperature: float, top_p: float = 1.0):
        max_len = padded_len + max_new
        sample = self._sampler(temperature, top_p)

        def run(params, input_ids, position_ids, true_len, pixel_patches, rng):
            B = input_ids.shape[0]
            cache, last_logits, next_pos_base = self._prefill_math(
                params, input_ids, position_ids, true_len, pixel_patches,
                grid_thw, padded_len, max_len)
            key0, rng = jax.random.split(rng)
            first_token = sample(last_logits, key0)
            step = self._decode_step(params, padded_len, max_len, sample,
                                     true_len, next_pos_base)
            init = (cache, first_token, jnp.int32(0), rng,
                    jnp.zeros((B,), bool))
            _, tokens = jax.lax.scan(step, init, None, length=max_new)
            return tokens.swapaxes(0, 1)  # (B, max_new)

        return jax.jit(run)

    def _build_chunked(self, padded_len: int, grid_thw, cap: int,
                       temperature: float, top_p: float, chunk: int):
        """Prefill + per-chunk decode programs for early-exit decoding.

        The scan carry (cache, pending token, cursor, rng key, done)
        threads through chunk boundaries unchanged, so the emitted
        stream is bit-identical to the one-shot scan — including
        sampling, whose per-step keys derive only from the carried key.
        The host stops as soon as every row is finished, instead of
        paying max_new decode steps regardless of output length."""
        max_len = padded_len + cap
        sample = self._sampler(temperature, top_p)

        def prefill(params, input_ids, position_ids, true_len,
                    pixel_patches, rng):
            B = input_ids.shape[0]
            cache, last_logits, next_pos_base = self._prefill_math(
                params, input_ids, position_ids, true_len, pixel_patches,
                grid_thw, padded_len, max_len)
            key0, rng = jax.random.split(rng)
            first_token = sample(last_logits, key0)
            carry = (cache, first_token, jnp.int32(0), rng,
                     jnp.zeros((B,), bool))
            return carry, next_pos_base

        def decode_chunk(params, carry, true_len, next_pos_base):
            step = self._decode_step(params, padded_len, max_len, sample,
                                     true_len, next_pos_base)
            carry, tokens = jax.lax.scan(step, carry, None, length=chunk)
            # a row is finished once it has FED an eos (done) or its
            # pending token is eos — every later emission is eos
            _, token, _, _, done = carry
            all_done = jnp.all(done | (token == self.eos_token_id))
            return carry, tokens.swapaxes(0, 1), all_done

        # donate the carry: the chunk updates the KV cache in place
        # instead of double-buffering it at every chunk boundary
        return jax.jit(prefill), jax.jit(decode_chunk, donate_argnums=(1,))

    def generate(self, input_ids: np.ndarray,
                 pixel_patches: Optional[np.ndarray] = None,
                 grid_thw: Tuple[Tuple[int, int, int], ...] = (),
                 max_new_tokens: Optional[int] = None,
                 temperature: float = 0.0, top_p: float = 1.0,
                 seed: int = 0, prompt_bucket: int = 128,
                 true_lens: Optional[np.ndarray] = None,
                 position_ids: Optional[np.ndarray] = None,
                 chunk: Optional[int] = None) -> np.ndarray:
        """input_ids (B, S); returns (B, new) token ids (eos-padded
        after stop).  Prompts are right-padded to the next
        ``prompt_bucket`` multiple so compilation cost is per bucket,
        not per exact length.

        Heterogeneous batches: pass ``true_lens`` (B,) per-row valid
        lengths (rows right-padded to S with any non-image token) plus
        the matching ``position_ids`` (3, B, S) computed on unpadded
        rows; ``grid_thw`` then lists every row's grids flat in row
        order and ``pixel_patches`` concatenates rows' patches the same
        way.  Without ``true_lens`` all rows are taken as full-length
        (the single-request path).

        ``chunk=K`` decodes in K-step segments with host-side early
        exit: once every row has emitted eos the remaining (max_new -
        emitted) steps are skipped — a ~200-token audit answer under a
        1024-token budget stops paying the weight stream ~5x over.
        Emitted tokens are bit-identical to the one-shot scan
        (including sampling — the rng key threads through the carry);
        cost is one host round-trip per K steps."""
        max_new = max_new_tokens or self.max_new_tokens
        ids = np.asarray(input_ids)
        seq_len = ids.shape[1]
        if true_lens is None:
            true_lens = np.full((ids.shape[0],), seq_len, dtype=np.int32)
        if position_ids is None:
            position_ids = compute_mrope_position_ids(
                ids, grid_thw, self.config.image_token_id,
                self.config.vision.spatial_merge_size)
        padded_len = -(-seq_len // prompt_bucket) * prompt_bucket
        if padded_len > seq_len:
            pad = padded_len - seq_len
            ids = np.pad(ids, [(0, 0), (0, pad)])
            position_ids = np.pad(position_ids, [(0, 0), (0, 0), (0, pad)])
        patches = (jnp.asarray(pixel_patches)
                   if pixel_patches is not None else None)
        args = (self.params, jnp.asarray(ids), jnp.asarray(position_ids),
                jnp.asarray(true_lens, dtype=jnp.int32), patches,
                jax.random.PRNGKey(seed))
        if chunk:
            # cache sized to max_new rounded up to the chunk grid, so
            # nearby budgets share one compile
            cap = -(-max_new // chunk) * chunk
            key = (padded_len, tuple(grid_thw), cap,
                   float(temperature), float(top_p), int(chunk), "chunked")
            if key not in self._jitted:
                self._jitted[key] = self._build_chunked(
                    padded_len, tuple(grid_thw), cap, temperature, top_p,
                    int(chunk))
            prefill_fn, chunk_fn = self._jitted[key]
            carry, pos_base = prefill_fn(*args)
            tl = args[3]
            pieces = []
            emitted = 0
            while emitted < max_new:
                carry, toks, all_done = chunk_fn(self.params, carry, tl,
                                                 pos_base)
                pieces.append(np.asarray(toks))
                emitted += chunk
                if bool(all_done):
                    break
            out = np.concatenate(pieces, axis=1)
            if out.shape[1] < max_new:  # skipped tail would be all eos
                pad = np.full((out.shape[0], max_new - out.shape[1]),
                              self.eos_token_id, out.dtype)
                out = np.concatenate([out, pad], axis=1)
            return out[:, :max_new]
        key = (padded_len, tuple(grid_thw), max_new,
               float(temperature), float(top_p))
        if key not in self._jitted:
            self._jitted[key] = self._build(padded_len, tuple(grid_thw),
                                            max_new, temperature, top_p)
        tokens = self._jitted[key](*args)
        return np.asarray(tokens)


# ---------------------------------------------------------------------------
# Checkpoint conversion
# ---------------------------------------------------------------------------


def convert_hf_qwen3_vl(sd: Dict[str, np.ndarray], vision_depth: int,
                        text_layers: int) -> Dict:
    """HF Qwen3VLForConditionalGeneration state dict -> Qwen3VLModel
    params (handles both 'model.visual.*' and 'visual.*' prefixes)."""
    from emr2a_tpu.models.convert import _dense, _ln

    prefix = "model." if any(k.startswith("model.visual.") for k in sd) else ""
    vp = prefix + "visual."
    tp = prefix + "language_model."

    def merger(base):
        return {
            "norm": _ln(sd, base + "norm"),
            "fc1": _dense(sd, base + "linear_fc1"),
            "fc2": _dense(sd, base + "linear_fc2"),
        }

    visual: Dict = {
        "patch_embed": {
            "kernel": sd[vp + "patch_embed.proj.weight"].reshape(
                sd[vp + "patch_embed.proj.weight"].shape[0], -1).T,
            "bias": sd[vp + "patch_embed.proj.bias"],
        },
        "pos_embed": sd[vp + "pos_embed.weight"],
        "merger": merger(vp + "merger."),
    }
    n_deep = len([k for k in sd if "deepstack_merger_list" in k
                  and k.endswith("linear_fc1.weight")])
    for j in range(n_deep):
        visual[f"deepstack_merger_{j}"] = merger(
            vp + f"deepstack_merger_list.{j}.")
    for i in range(vision_depth):
        b = vp + f"blocks.{i}."
        qkv_w = sd[b + "attn.qkv.weight"]
        qkv_b = sd.get(b + "attn.qkv.bias")
        d = qkv_w.shape[1]
        block = {
            "norm1": _ln(sd, b + "norm1"),
            "norm2": _ln(sd, b + "norm2"),
            "q_proj": {"kernel": qkv_w[:d].T},
            "k_proj": {"kernel": qkv_w[d:2 * d].T},
            "v_proj": {"kernel": qkv_w[2 * d:].T},
            "o_proj": _dense(sd, b + "attn.proj"),
            "fc1": _dense(sd, b + "mlp.linear_fc1"),
            "fc2": _dense(sd, b + "mlp.linear_fc2"),
        }
        if qkv_b is not None:
            block["q_proj"]["bias"] = qkv_b[:d]
            block["k_proj"]["bias"] = qkv_b[d:2 * d]
            block["v_proj"]["bias"] = qkv_b[2 * d:]
        visual[f"block_{i}"] = block

    text: Dict = {
        "embed_tokens": {"embedding": sd[tp + "embed_tokens.weight"]},
        "final_ln": {"scale": sd[tp + "norm.weight"]},
    }
    for i in range(text_layers):
        b = tp + f"layers.{i}."
        text[f"layer_{i}"] = {
            "input_ln": {"scale": sd[b + "input_layernorm.weight"]},
            "post_ln": {"scale": sd[b + "post_attention_layernorm.weight"]},
            "q_proj": _dense(sd, b + "self_attn.q_proj"),
            "k_proj": _dense(sd, b + "self_attn.k_proj"),
            "v_proj": _dense(sd, b + "self_attn.v_proj"),
            "o_proj": _dense(sd, b + "self_attn.o_proj"),
            "q_norm_scale": sd[b + "self_attn.q_norm.weight"],
            "k_norm_scale": sd[b + "self_attn.k_norm.weight"],
            "gate_proj": _dense(sd, b + "mlp.gate_proj"),
            "up_proj": _dense(sd, b + "mlp.up_proj"),
            "down_proj": _dense(sd, b + "mlp.down_proj"),
        }
    lm_head_key = "lm_head.weight"
    if lm_head_key in sd:
        text["lm_head"] = {"kernel": sd[lm_head_key].T}
    return {"visual": visual, "language_model": text}


def qwen3_vl_config_from_hf(cfg: Dict) -> Qwen3VLConfig:
    v = cfg.get("vision_config", {})
    t = cfg.get("text_config", {})
    rope_scaling = t.get("rope_scaling") or {}
    return Qwen3VLConfig(
        vision=QwenVisionConfig(
            depth=v.get("depth", 27),
            hidden_size=v.get("hidden_size", 1152),
            intermediate_size=v.get("intermediate_size", 4304),
            num_heads=v.get("num_heads", 16),
            patch_size=v.get("patch_size", 16),
            temporal_patch_size=v.get("temporal_patch_size", 2),
            spatial_merge_size=v.get("spatial_merge_size", 2),
            out_hidden_size=v.get("out_hidden_size", 3584),
            num_position_embeddings=v.get("num_position_embeddings", 2304),
            deepstack_visual_indexes=tuple(
                v.get("deepstack_visual_indexes", (8, 16, 24))),
            hidden_act=v.get("hidden_act", "gelu_pytorch_tanh")),
        text=QwenTextConfig(
            vocab_size=t.get("vocab_size", 151936),
            hidden_size=t.get("hidden_size", 4096),
            num_layers=t.get("num_hidden_layers", 36),
            num_heads=t.get("num_attention_heads", 32),
            num_kv_heads=t.get("num_key_value_heads", 8),
            head_dim=t.get("head_dim", t.get("hidden_size", 4096)
                           // t.get("num_attention_heads", 32)),
            intermediate_size=t.get("intermediate_size", 12288),
            rms_norm_eps=t.get("rms_norm_eps", 1e-6),
            rope_theta=t.get("rope_theta", 5e6),
            mrope_section=tuple(rope_scaling.get("mrope_section",
                                                 (24, 20, 20))),
            attention_bias=t.get("attention_bias", False),
            # text_config's flag wins over the top-level one (HF ties
            # only when the text config says so).
            tie_word_embeddings=t.get(
                "tie_word_embeddings", cfg.get("tie_word_embeddings", True))),
        image_token_id=cfg.get("image_token_id", 151655),
        video_token_id=cfg.get("video_token_id", 151656),
        vision_start_token_id=cfg.get("vision_start_token_id", 151652))
