"""Speculative decoding for the Qwen3-VL judge.

A small draft model (e.g. the 2B judge) proposes ``k`` tokens per
cycle; the target (the flagship 8B judge,
/root/reference/encoders/qwen3_vl_8b_thinking_encoder.py:30-43)
verifies all ``k+1`` positions in ONE forward pass.  With greedy
(temperature 0) acceptance — accept the longest draft prefix whose
tokens equal the target's argmax — the emitted stream is EXACTLY the
target's own greedy decode, token for token (pinned by
tests/test_speculative.py).  With ``temperature > 0`` the
rejection-sampling acceptance rule (qwen3_vl.spec_accept) keeps the
emitted stream distributed exactly as sampling from the target alone
(pinned statistically by tests/test_sampled_speculative.py) — this is
what lets ``--draft_model`` compose with the reference's
``temperature=0.2`` LLM default
(/root/reference/config/llm_config.py).  Either way decode wall-time
drops whenever the draft agrees with the target: the target's weight
stream (the 8B decode bottleneck, ~8.2 GB/token — docs/PERF_NOTES.md)
is paid once per *cycle* instead of once per *token*.

TPU design: the whole loop is one jitted ``lax.while_loop`` over
fixed-shape carries (both models' static KV caches, an output buffer,
scalar cursors).  Rejected-draft cache slots are never masked *in* —
every attention mask only exposes positions below the verified
length — and are overwritten by later cycles before they could be
exposed, so no rollback copies are needed.  Verification needs logits
at all k+1 chunk positions, so the chunk forward projects every chunk
position to the vocab (k+1 rows, not the full prompt).

B=1 only: speculative decoding is the *latency* optimization for
interactive auditing; batched serving (Qwen3VLGenerator with B>1) is
the throughput path and already amortizes the weight stream across
rows.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emr2a_tpu.models.qwen3_vl import (
    Qwen3VLModel,
    compute_mrope_position_ids,
    filtered_log_probs,
    spec_accept,
)


class SpeculativeGenerator:
    """Speculative prefill+decode over two Qwen3-VL models.

    ``target_model/params`` and ``draft_model/params`` must share the
    tokenizer (vocab) — true for the Qwen3-VL family (2B drafts for
    8B).  ``spec_k`` draft tokens are proposed per cycle; each cycle
    emits between 1 and ``spec_k + 1`` verified tokens.

    ``kv_dtype="int8"`` applies to BOTH models' caches (s8 values +
    folded scales, models/qwen3_vl.quantize_kv).
    """

    def __init__(self, target_model: Qwen3VLModel, target_params,
                 draft_model: Qwen3VLModel, draft_params,
                 spec_k: int = 4, eos_token_id: int = 151645,
                 kv_dtype: str = "bf16"):
        if target_model.config.text.vocab_size != \
                draft_model.config.text.vocab_size:
            raise ValueError("draft and target must share a vocabulary")
        self.tm, self.tp = target_model, target_params
        self.dm, self.dp = draft_model, draft_params
        self.spec_k = int(spec_k)
        if self.spec_k < 1:
            raise ValueError("spec_k must be >= 1")
        self.eos_token_id = eos_token_id
        if kv_dtype not in ("bf16", "int8"):
            raise ValueError(f"kv_dtype must be bf16 or int8: {kv_dtype}")
        self.kv_dtype = kv_dtype
        self._jitted: Dict = {}

    # -- cache helpers ----------------------------------------------------

    def _empty_cache(self, cfg, max_len: int):
        from emr2a_tpu.models.qwen3_vl import empty_kv_cache
        return empty_kv_cache(cfg, 1, max_len, self.kv_dtype)

    # -- compiled program --------------------------------------------------

    def _build(self, padded_len: int, grid_thw, max_new: int,
               temperature: float = 0.0, top_p: float = 1.0):
        k = self.spec_k
        eos = self.eos_token_id
        sampling = temperature > 0
        temp_v = jnp.full((1,), temperature, jnp.float32)
        top_p_v = jnp.full((1,), top_p if sampling else 1.0, jnp.float32)
        # the last cycle may start at out_pos == max_new - 1 and write
        # k + 1 candidates; cache/output carry that slack
        out_len = max_new + k + 1
        max_len = padded_len + out_len

        def prefill(model, params, cache, input_ids, position_ids,
                    true_len, pixel_patches):
            q_idx = jnp.arange(padded_len)[None, :, None]
            k_idx = jnp.arange(max_len)[None, None, :]
            mask = jnp.where((k_idx <= q_idx) & (k_idx < true_len),
                             0.0, -jnp.inf).astype(jnp.float32)
            hidden, cache = model.apply(
                {"params": params}, input_ids, position_ids,
                pixel_patches=pixel_patches, grid_thw=grid_thw,
                cache=cache, cache_pos=0, attn_mask=mask,
                return_hidden=True)
            last = hidden[jnp.arange(1), true_len - 1]  # (1, D)
            logits = model.apply(
                {"params": params}, last,
                method=lambda m, h: m.language_model.project(h))
            return cache, logits.astype(jnp.float32)  # (1, V)

        def gen_mask(true_len, gen_hi):
            """(1, 1, max_len) additive mask exposing the true prompt
            plus generated cache slots <= ``gen_hi`` (absolute)."""
            k_idx = jnp.arange(max_len)[None, None, :]
            ok = (k_idx < true_len) | ((k_idx >= padded_len)
                                       & (k_idx <= gen_hi))
            return jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)

        def run(tparams, dparams, input_ids, position_ids, true_len,
                pixel_patches, rng):
            t_cache = self._empty_cache(self.tm.config.text, max_len)
            d_cache = self._empty_cache(self.dm.config.text, max_len)
            t_cache, logits0 = prefill(self.tm, tparams, t_cache, input_ids,
                                       position_ids, true_len, pixel_patches)
            d_cache, _ = prefill(self.dm, dparams, d_cache, input_ids,
                                 position_ids, true_len, pixel_patches)
            next_pos_base = position_ids.max() + 1  # scalar (B=1)

            rng, k0 = jax.random.split(rng)
            if sampling:
                first = jax.vmap(jax.random.categorical)(
                    k0[None], filtered_log_probs(logits0, temp_v, top_p_v))
            else:
                first = jnp.argmax(logits0, axis=-1)
            out0 = jnp.full((out_len,), eos, jnp.int32)
            out0 = out0.at[0].set(first[0].astype(jnp.int32))
            # invariant at cycle start: out[:n_emitted] are verified
            # target tokens; both caches cover the prompt plus
            # generated tokens g_0..g_{n_emitted-2}; cur = g_{n_emitted-1}
            # is emitted but not yet fed to either model.
            carry0 = (t_cache, d_cache, jnp.int32(1),
                      first[0].astype(jnp.int32) == eos, out0, rng)

            def cond(c):
                _, _, n_emitted, done, _, _ = c
                return (n_emitted < max_new) & ~done

            def draft_step(d_cache, tok, gen_idx):
                """Feed one token to the draft at generated-slot
                ``gen_idx``; returns its next-token logits (1, V)."""
                pos = jnp.broadcast_to(
                    (next_pos_base + gen_idx)[None, None, None], (3, 1, 1))
                mask = gen_mask(true_len, padded_len + gen_idx)
                logits, d_cache = self.dm.apply(
                    {"params": dparams}, tok[None, None], pos,
                    cache=d_cache, cache_pos=padded_len + gen_idx,
                    attn_mask=mask)
                return d_cache, logits[:, -1].astype(jnp.float32)

            def body(c):
                t_cache, d_cache, n_emitted, done, out, key = c
                base = n_emitted - 1  # generated-slot index of cur
                cur = out[base]

                # -- draft k proposals (+1 feed so the draft cache also
                # covers d_k, needed when every proposal is accepted)
                def dstep(carry, i):
                    dc, tok, key = carry
                    dc, logits = draft_step(dc, tok, base + i)
                    if sampling:
                        q_lp = filtered_log_probs(logits, temp_v,
                                                  top_p_v)  # (1, V)
                        key, sub = jax.random.split(key)
                        nxt = jax.random.categorical(
                            sub, q_lp[0]).astype(jnp.int32)
                        return (dc, nxt, key), (nxt, q_lp[0])
                    nxt = jnp.argmax(logits[0]).astype(jnp.int32)
                    return (dc, nxt, key), nxt

                (d_cache, _, key), d_out = jax.lax.scan(
                    dstep, (d_cache, cur, key), jnp.arange(k + 1))
                if sampling:
                    drafts, q_lp = d_out[0][:k], d_out[1][:k]  # (k,), (k,V)
                else:
                    drafts = d_out[:k]  # (k,) proposals d_1..d_k

                # -- target verifies the chunk [cur, d_1..d_k] in ONE
                # forward: logits at chunk position j give the target's
                # token after g_{n-1+j}
                chunk = jnp.concatenate([cur[None], drafts])[None]  # (1,k+1)
                gen_idx = base + jnp.arange(k + 1)
                pos = jnp.broadcast_to(
                    (next_pos_base + gen_idx)[None, None, :], (3, 1, k + 1))
                k_idx = jnp.arange(max_len)[None, None, :]
                hi = (padded_len + gen_idx)[None, :, None]
                ok = (k_idx < true_len) | ((k_idx >= padded_len)
                                           & (k_idx <= hi))
                mask = jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)
                logits, t_cache = self.tm.apply(
                    {"params": tparams}, chunk, pos,
                    cache=t_cache, cache_pos=padded_len + base,
                    attn_mask=mask)

                if sampling:
                    # rejection-sampling acceptance: the emitted prefix
                    # is distributed exactly as target-only sampling
                    p_lp = filtered_log_probs(
                        logits[0].astype(jnp.float32),
                        jnp.full((k + 1,), temperature, jnp.float32),
                        jnp.full((k + 1,), top_p, jnp.float32))
                    key, sub = jax.random.split(key)
                    em_b, acc_b = spec_accept(drafts[None], q_lp[None],
                                              p_lp[None], sub[None])
                    targets, n_acc = em_b[0], acc_b[0]
                else:
                    targets = jnp.argmax(logits[0],
                                         axis=-1).astype(jnp.int32)
                    # greedy acceptance: longest prefix with
                    # d_j == tau_{j-1}
                    match = drafts == targets[:k]
                    n_acc = jnp.argmin(jnp.cumprod(match.astype(jnp.int32)))
                    n_acc = jnp.where(match.all(), k, n_acc)

                # emit tau_0..tau_m (m = n_acc): the accepted drafts ARE
                # tau_0..tau_{m-1}, plus the correction/bonus tau_m.
                # Write all k+1 candidates (static shape), advance by
                # m+1 — slots past the cursor are re-written later.
                out = jax.lax.dynamic_update_slice(out, targets,
                                                   (n_emitted,))
                valid = jnp.arange(k + 1) <= n_acc
                done = done | jnp.any(valid & (targets == eos))
                return (t_cache, d_cache, n_emitted + n_acc + 1, done, out,
                        key)

            _, _, n_final, _, out, _ = jax.lax.while_loop(cond, body, carry0)

            # eos semantics match Qwen3VLGenerator: everything after the
            # first eos (or past the emitted count) reads eos
            out = jnp.where(jnp.arange(out_len) < n_final, out, eos)
            is_eos = out == eos
            first_eos = jnp.argmax(is_eos)
            cut = jnp.where(is_eos.any(), first_eos, out_len)
            out = jnp.where(jnp.arange(out_len) > cut, eos, out)
            return out[:max_new][None], n_final  # (1, max_new), emitted

        return jax.jit(run)

    # -- public API ---------------------------------------------------------

    def generate(self, input_ids: np.ndarray,
                 pixel_patches: Optional[np.ndarray] = None,
                 grid_thw: Tuple[Tuple[int, int, int], ...] = (),
                 max_new_tokens: int = 128,
                 prompt_bucket: int = 128,
                 temperature: float = 0.0, top_p: float = 1.0,
                 seed: int = 0) -> np.ndarray:
        """input_ids (1, S) -> (1, max_new_tokens) tokens.

        ``temperature <= 0`` is the lossless greedy path — identical to
        the target's own greedy decode, token for token.
        ``temperature > 0`` samples through rejection-sampling
        acceptance (qwen3_vl.spec_accept): proposals come from the
        draft's filtered distribution and the emitted stream is
        distributed exactly as sampling from the target alone (pinned
        statistically by tests/test_sampled_speculative.py)."""
        ids = np.asarray(input_ids)
        if ids.shape[0] != 1:
            raise ValueError("speculative decoding is the B=1 latency "
                             "path; use Qwen3VLGenerator for batches")
        position_ids = compute_mrope_position_ids(
            ids, grid_thw, self.tm.config.image_token_id,
            self.tm.config.vision.spatial_merge_size)
        seq_len = ids.shape[1]
        padded_len = -(-seq_len // prompt_bucket) * prompt_bucket
        if padded_len > seq_len:
            pad = padded_len - seq_len
            ids = np.pad(ids, [(0, 0), (0, pad)])
            position_ids = np.pad(position_ids, [(0, 0), (0, 0), (0, pad)])
        temperature = float(temperature)
        top_p = float(top_p) if temperature > 0 else 1.0
        key = (padded_len, tuple(grid_thw), int(max_new_tokens),
               temperature, top_p)
        if key not in self._jitted:
            self._jitted[key] = self._build(padded_len, tuple(grid_thw),
                                            int(max_new_tokens),
                                            temperature, top_p)
        patches = (jnp.asarray(pixel_patches)
                   if pixel_patches is not None else None)
        tokens, _ = self._jitted[key](
            self.tp, self.dp, jnp.asarray(ids), jnp.asarray(position_ids),
            jnp.asarray([seq_len], jnp.int32), patches,
            jax.random.PRNGKey(int(seed)))
        return np.asarray(tokens)
