"""Flash attention for the frame-batched vision tower.

DEMOTED — measured loser (round 5, BENCH_vision_attn.json): at the
audit shape (F=8, H=16, S=784, hd=72) this kernel runs 1.63 ms/op
(block_k=128) or 0.90 ms (pad-to-1024, block 512) vs 0.323 ms for the
lax.map-per-frame einsum chain that is now the default TPU lowering
(QwenVisionConfig.attn_impl="scan").  The library kernel pads head_dim
72 -> 128 lanes inside Mosaic, wasting 44% of every MXU pass, and its
kv blocks must be multiples of 128 — at these shapes the fusion-window
rewrite beats it 5x.  Kept selectable (attn_impl="flash") per the repo
convention of preserving measured losers with their numbers.

Round-5 measurement (docs/PERF_NOTES.md "Qwen3-VL vision-tap ENCODER
mode"): the batched einsum->softmax->einsum chain in QwenVisionBlock
materializes (frames, heads, S, S) f32 logits through HBM — 315 MB per
block at the audit shape (8 frames of 448², S=784) — and the
logits+probs round-trip is the whole forward's bottleneck (~2.5
ms/block of pure HBM traffic vs ~45 µs of MXU work).  This wraps JAX's
Pallas TPU flash kernel (never materializes logits; f32 softmax state
stays in VMEM) for the vision shapes:

- inputs are post-RoPE q/k/v in the tower's (frames, S, heads, hd)
  layout;
- S is padded to the next multiple of 128 and masked via SegmentIds
  (pad tokens get segment 0, valid tokens 1 — flash confines attention
  to equal segments, so pad rows never contaminate valid rows);
- head_dim 72 is left as-is (Mosaic lane-pads internally);
- block sizes: the largest divisor of padded S that is ≤ 512 and a
  multiple of the kernel granule — 8 (sublane) for q blocks, 128
  (lane) for kv blocks (the library kernel rejects kv blocks that are
  not multiples of 128).

Numeric parity vs the einsum chain is validated on-chip by
scripts/exp_vision_attn.py (both do f32 softmax; max|Δ| is bf16
rounding).  There is no interpret-mode path in the library kernel, so
CPU test lanes exercise the dispatch/padding logic with a stub kernel
(tests/test_vision_flash.py) and the einsum fallback for numerics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _block(s_pad: int, granule: int, cap: int = 512) -> int:
    best = granule
    for b in range(granule, min(s_pad, cap) + 1, granule):
        if s_pad % b == 0:
            best = b
    return best


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def _flash(q, k, v, segq, segkv, sm_scale):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    s_pad = q.shape[2]
    bq = _block(s_pad, 8)
    bk = _block(s_pad, 128)
    sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_q_dkv=bq, block_k_dkv=bk,
        block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk)
    seg = None
    if segq is not None:
        seg = SegmentIds(q=segq, kv=segkv)
    return flash_attention(q, k, v, segment_ids=seg, causal=False,
                           sm_scale=sm_scale, block_sizes=sizes)


def frame_flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          sm_scale: float,
                          pad_multiple: int = 128) -> jax.Array:
    """Per-frame non-causal attention, (F, S, H, hd) -> (F, S, H, hd).

    Frames are independent batch entries (the tower's uniform
    frame-batched layout — attention never crosses a frame).
    pad_multiple trades pad waste for kv-block size (padding to 512
    lets block_k=512 instead of 128; measured in exp_vision_attn.py)."""
    f, s, h, hd = q.shape
    s_pad = -(-s // pad_multiple) * pad_multiple
    # kernel layout (batch, heads, seq, head_dim)
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    segq = segkv = None
    if s_pad != s:
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        qt, kt, vt = (jnp.pad(t, pad) for t in (qt, kt, vt))
        valid = (jnp.arange(s_pad) < s).astype(jnp.int32)[None, :]
        segq = segkv = jnp.broadcast_to(valid, (f, s_pad))
    out = _flash(qt, kt, vt, segq, segkv, sm_scale)
    return jnp.swapaxes(out[:, :, :s, :], 1, 2)
