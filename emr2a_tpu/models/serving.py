"""Continuous batching for the Qwen3-VL judge (slot-based serving).

``Qwen3VLGenerator.generate`` with B>1 amortizes the weight stream
across rows, but a *static* batch decodes until its slowest row
finishes: with heterogeneous audit outputs (the reference's audit
answers vary from one-line accepts to long rationales,
/root/reference/pipelines/step4_vlm_review/vlm_audit_module.py:249-364)
the batch throughput degrades toward the longest row.  The
ContinuousBatcher fixes the straggler problem vLLM-style, but with
static TPU shapes: N fixed slots, each with a fixed-length KV-cache
region, decoded together in chunks; whenever a slot's request
finishes, the host prefills the next queued request into that slot
while the other slots keep decoding.

TPU design notes:
- Decode must advance slots that sit at *different* generation depths,
  so the KV write is a per-row scatter (models/qwen3_vl.cache_write
  with a (B,) ``cache_pos``) instead of the shared-offset
  dynamic_update_slice; masks/positions are already per-row.
- The chunk loop is a ``lax.scan`` inside ONE jit: the host syncs once
  per ``chunk`` steps (~30 ms relay RTT amortized over the chunk), and
  compilation is one program regardless of request mix.
- Refill prefill batches the head-of-queue run with one image-grid
  layout into a single program (one weight stream for up to n_slots
  suffix prefills), scattered into the slot axis in one insert.
- A serve() wave whose requests open with the same token prefix — the
  audit workload, where every case carries the same long instruction
  template — prefills that prefix ONCE and splices its KV under every
  request; each refill then prefills only the per-case suffix.

Greedy parity: each request's emitted stream is exactly what
``Qwen3VLGenerator.generate`` (B=1, temperature 0) emits — pinned by
tests/test_serving.py across staggered lengths, eos stops, int8 KV,
and multimodal requests.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emr2a_tpu.models.qwen3_vl import (
    Qwen3VLModel,
    auto_prefill_chunk,
    chunked_prefill,
    compute_mrope_position_ids,
    constrain_kv_cache,
    empty_kv_cache,
    filtered_log_probs,
    kv_cache_sharding_specs,
    sample_rows,
    spec_accept,
)


# A wave-level common prefix shorter than this is not worth its own
# prefill program (compile + per-wave prefix pass) — chat headers alone
# are a handful of tokens; the audit template is hundreds.
_MIN_SHARED_PREFIX = 16

# Auto cap on the transient KV duplicate a batched refill prefill
# carries before its insert (see ContinuousBatcher.__init__).
_REFILL_KV_BUDGET = 1 * 2**30

# Auto-batch refills only when the per-row suffix prefill is weight-
# stream-bound: at 8B the decoder stream is ~25 ms while prefill
# compute crosses that around ~400 suffix tokens (measured 83-90 ms at
# 1024), so beyond this length batching is linear work for no stream
# saving — and measured slightly slower (worse XLA layout at Bp>1).
_BATCH_REFILL_MAX_SUFFIX = 384


class ContinuousBatcher:
    """Slot-based continuous serving over one Qwen3-VL model.

    ``n_slots`` requests decode together; finished slots are refilled
    from the queue between chunks.  ``prompt_bucket`` is the single
    static prompt length every request is padded to (requests longer
    than the bucket are rejected — pick the bucket for the workload,
    e.g. 1024 for the audit prompts).  ``chunk`` is the number of
    decode steps per host round-trip; a finished row wastes at most
    ``chunk - 1`` steps before its slot is reused.
    """

    def __init__(self, model: Qwen3VLModel, params, n_slots: int = 8,
                 prompt_bucket: int = 1024, max_new_tokens: int = 1024,
                 eos_token_id: int = 151645, kv_dtype: str = "bf16",
                 chunk: int = 16, draft_model: Optional[Qwen3VLModel] = None,
                 draft_params=None, spec_k: int = 4,
                 prefill_chunk: Optional[int] = None,
                 shared_prefix: bool = True,
                 refill_batch: Optional[int] = None,
                 mesh=None, ring_decode: bool = True):
        """``draft_model/draft_params`` turn every slot speculative:
        each chunk iteration becomes a draft-k/verify-1 cycle (the
        draft proposes ``spec_k`` tokens per slot, the target verifies
        all slots' k+1 positions in ONE forward), so a chunk of C
        cycles emits between C and C*(k+1) tokens per slot.  The
        verify step at B slots is still weight-bandwidth-bound, so
        accepted drafts multiply aggregate throughput on top of the
        batching amortization.  Greedy slots are lossless (every
        slot's stream is exactly the target's own greedy decode);
        sampled slots serve through rejection sampling
        (models/qwen3_vl.spec_accept — the emitted stream is
        distributed exactly as target-only sampling), so mixed
        greedy/sampled waves compose with a draft.

        ``shared_prefix`` (default on): when every request in a
        serve() wave opens with the same >=16-token prefix, prefill it
        once and splice its KV under every request — each refill then
        prefills only its per-case suffix.  Auto-detected per wave,
        clipped before the first image token, token-exact vs whole
        prefills (tests/test_serving.py shared-prefix suite).

        ``refill_batch`` caps how many queued requests one batched
        refill prefills together (auto: sized so the transient KV
        duplicate the batch carries before its insert stays ~1 GiB).

        ``mesh``: serve tensor-parallel over a jax.sharding.Mesh — the
        bf16-8B mode.  The caller shards ``params`` (and
        ``draft_params``) over the mesh ``model`` axis
        (training/sharding_rules.param_shardings + device_put); the
        batcher anchors every KV cache — slot state, shared-prefix
        cache, refill prefill caches — on the kv-head axis
        (models/qwen3_vl.kv_cache_sharding_specs), so decode attention
        reads local heads and only the row-parallel all-reduces cross
        ICI.  Emitted streams are identical to the single-device path
        (tests/test_serving_tp.py pins token parity on the 8-device
        CPU mesh)."""
        self.model = model
        self.params = params
        self.mesh = mesh
        self.config = model.config
        self.n_slots = int(n_slots)
        self.prompt_bucket = int(prompt_bucket)
        self.max_new_tokens = int(max_new_tokens)
        self.eos_token_id = int(eos_token_id)
        if kv_dtype not in ("bf16", "int8"):
            raise ValueError(f"kv_dtype must be bf16 or int8: {kv_dtype}")
        self.kv_dtype = kv_dtype
        self.chunk = int(chunk)
        self.draft_model = draft_model
        self.draft_params = draft_params
        self.spec_k = int(spec_k)
        if draft_model is not None:
            if draft_model.config.text.vocab_size != \
                    model.config.text.vocab_size:
                raise ValueError("draft and target must share a vocabulary")
            if self.spec_k < 1:
                raise ValueError("spec_k must be >= 1")
        # chunk slack: a row that hits its budget right after a chunk
        # boundary keeps writing garbage KV until the host deactivates
        # it at the next boundary; a speculative chunk advances up to
        # (spec_k + 1) positions per cycle.  TWO chunks of slack, not
        # one: the chunk lookahead (see serve(); runs in both the main
        # and tail phases) dispatches the next chunk before this
        # chunk's readback, so a budget-exhausted slot can stay
        # device-active for the already-dispatched chunk too — never
        # more than one extra chunk, because the following dispatch
        # sees the updated active mask.  cache_write's (B,) scatter uses
        # mode='drop' as a final backstop (overruns past max_len are
        # dropped, never wrapped into other rows), but the slack is
        # sized so the backstop is never load-bearing.
        per_iter = (self.spec_k + 1) if draft_model is not None else 1
        self.max_len = (self.prompt_bucket + self.max_new_tokens
                        + 2 * self.chunk * per_iter)
        # Sequence-chunked refill prefill (models/qwen3_vl.py
        # chunked_prefill): bounds the (Bp, heads, bucket, max_len) f32
        # attention temps at long prompt buckets / batched refills.
        # When the caller gave no explicit chunk, each compiled prefill
        # resolves its own chunk from its (batch, length) via
        # auto_prefill_chunk (see _fit_chunk) so the batcher never OOMs
        # on prompt length or refill batch size.
        self._auto_chunk = prefill_chunk is None
        self.prefill_chunk = prefill_chunk
        # Shared-prefix KV: when every request in a serve() wave opens
        # with the same token prefix (the audit workload — one constant
        # instruction template across cases, matching the reference's
        # fixed template pipelines/step4_vlm_review/
        # prompt_templates.py:15-100), the prefix is prefilled ONCE per
        # wave and spliced under every refill, which then prefills only
        # its per-case suffix.
        self.shared_prefix = bool(shared_prefix)
        # Batched-refill policy (resolved per wave in serve()):
        # batching a refill prefill amortizes only the decoder WEIGHT
        # STREAM — row compute is linear — so it pays iff the per-row
        # suffix prefill is stream-bound (short suffixes: the shared-
        # prefix audit case).  Measured at 8B bucket 1024 whole-prompt
        # refills, batched was 8% SLOWER than serialized
        # (BENCH_continuous_r4.json A/B), so long suffixes default to
        # serial.  A batched refill also holds a SECOND Bp-row KV cache
        # until its insert, so the auto cap bounds that duplicate at
        # ~1 GiB — uncapped Bp=8 multimodal 8B serving needed 17.5 GiB.
        self._refill_batch_arg = refill_batch
        self.refill_batch = 1
        # Uniform-ring decode KV layout (see _build_chunk): scalar
        # write offsets -> dynamic-update-slice instead of per-row
        # scatter, which an HLO diff + on-chip A/B showed to be the
        # whole continuous-vs-static program tax (~2.6 ms/step at 8B,
        # BENCH_decode_tax.json).  The speculative path keeps per-row
        # offsets — rows advance by variable accepted counts per
        # cycle, so there is no shared scalar write position.
        self.ring_decode = bool(ring_decode) and draft_model is None
        self._prefill_fns: Dict = {}
        self._prefix_fns: Dict = {}
        self._insert_fns: Dict[int, object] = {}
        self._chunk_fns: Dict[bool, object] = {}
        self._state = None
        self._wave_lp = 0
        self._wave_prefix = None
        self._wave_draft_prefix = None

    # -- device state -------------------------------------------------------

    def _kv_bytes_per_row(self, text_cfg=None) -> int:
        cfg = text_cfg or self.config.text
        kv = self.max_len * cfg.num_kv_heads * cfg.head_dim
        if self.kv_dtype == "int8":
            per_layer = 2 * (kv + self.max_len * cfg.num_kv_heads * 4)
        else:
            per_layer = 2 * kv * 2  # bf16
        return per_layer * cfg.num_layers

    def _shard_cache(self, cache, text_cfg=None):
        """Eagerly place a host-built cache on the mesh, head-sharded
        (no-op without a mesh).  The in-program analogue is
        constrain_kv_cache."""
        if self.mesh is None:
            return cache
        from jax.sharding import NamedSharding
        val, scale = kv_cache_sharding_specs(
            text_cfg or self.config.text, self.mesh)

        def put(buf):
            spec = val if buf.ndim == 4 else scale
            return jax.device_put(buf, NamedSharding(self.mesh, spec))

        return [tuple(put(b) for b in layer) for layer in cache]

    def _init_state(self):
        B = self.n_slots
        cache = self._shard_cache(
            empty_kv_cache(self.config.text, B, self.max_len,
                           self.kv_dtype))
        state = {
            "cache": cache,
            "cur": jnp.full((B,), self.eos_token_id, jnp.int32),
            "gen": jnp.zeros((B,), jnp.int32),
            "pos_base": jnp.zeros((B,), jnp.int32),
            "tl": jnp.ones((B,), jnp.int32),
            # per-slot sampling state (temp <= 0 rows decode greedy)
            "key": jax.random.split(jax.random.PRNGKey(0), B),
            "temp": jnp.zeros((B,), jnp.float32),
            "top_p": jnp.ones((B,), jnp.float32),
            # global decode-step counter, shared by all rows — drives
            # the uniform-ring KV write slot (see _build_chunk)
            "step0": jnp.zeros((), jnp.int32),
        }
        if self.draft_model is not None:
            state["d_cache"] = self._shard_cache(
                empty_kv_cache(self.draft_model.config.text, B,
                               self.max_len, self.kv_dtype),
                self.draft_model.config.text)
        return state

    # -- compiled programs ---------------------------------------------------

    def _fit_chunk(self, seq_len: int, batch: int) -> Optional[int]:
        """Prefill chunk for a (batch, seq_len) prefill program, or
        None for one-shot.  Auto mode sizes the chunk so the per-layer
        (batch, heads, C, max_len) f32 attention temp fits the budget;
        an explicit ``prefill_chunk`` is rounded DOWN to the nearest
        divisor of ``seq_len`` (the chunked prefill scans equal
        slices — suffix/prefix lengths need not divide evenly by the
        user's whole-bucket chunk).  If that floor collapses below
        half the requested chunk (prime suffix lengths floor all the
        way to C=1 — a one-token-per-step scan, a severe compile and
        runtime cliff), the explicit value is treated as unusable for
        this seq_len and the auto policy decides instead."""
        if seq_len <= 1:
            return None
        if self._auto_chunk:
            return auto_prefill_chunk(
                batch, self.config.text.num_heads, seq_len, self.max_len)
        C = self.prefill_chunk
        if not C or C >= seq_len:
            return None
        requested = C
        while seq_len % C:
            C -= 1
        if C * 2 < requested:
            return auto_prefill_chunk(
                batch, self.config.text.num_heads, seq_len, self.max_len)
        return C

    def _shared_prefix_len(self, requests: Sequence[dict]) -> int:
        """Longest common token prefix across the wave, clipped before
        the first image token (image-token KV depends on per-request
        pixels, so it can never be shared) and so every request keeps a
        non-empty suffix.  Returns 0 when sharing is off, the wave is a
        single request, or the prefix is too short to pay for its own
        prefill program."""
        if not self.shared_prefix or len(requests) < 2:
            return 0
        rows = [np.asarray(r["input_ids"]).reshape(-1) for r in requests]
        lcp = min(len(r) for r in rows) - 1
        if lcp <= 0:
            return 0
        r0 = rows[0]
        for r in rows[1:]:
            neq = np.nonzero(r0[:lcp] != r[:lcp])[0]
            if neq.size:
                lcp = int(neq[0])
                if lcp <= 0:
                    return 0
        img = np.nonzero(r0[:lcp] == self.config.image_token_id)[0]
        if img.size:
            lcp = int(img[0])
        return lcp if lcp >= _MIN_SHARED_PREFIX else 0

    def _build_prefix(self, Lp: int, draft: bool = False):
        """Prefill the Lp-token shared prefix (text-only by
        construction) into a fresh 1-row cache — run once per wave,
        broadcast under every refill by the suffix prefill."""
        model = self.draft_model if draft else self.model
        max_len, C = self.max_len, self._fit_chunk(Lp, 1)

        def run(params, input_ids, position_ids):
            cache = constrain_kv_cache(
                empty_kv_cache(model.config.text, 1, max_len,
                               self.kv_dtype),
                self.mesh, model.config.text)
            tl = jnp.asarray([Lp], jnp.int32)
            if C and Lp > C:
                _, cache = chunked_prefill(
                    model, params, input_ids, position_ids, tl, None,
                    (), Lp, max_len, cache, C)
            else:
                q_idx = jnp.arange(Lp)[None, :, None]
                k_idx = jnp.arange(max_len)[None, None, :]
                mask = jnp.where((k_idx <= q_idx) & (k_idx < Lp),
                                 0.0, -jnp.inf).astype(jnp.float32)
                _, cache = model.apply(
                    {"params": params}, input_ids, position_ids,
                    cache=cache, cache_pos=0, attn_mask=mask,
                    return_hidden=True)
            return cache

        return jax.jit(run)

    def _build_prefill(self, grid_thw, Lp: int, Bp: int,
                       draft: bool = False):
        """One prefill program per (image layout, shared-prefix length,
        refill batch).  Prefills Bp requests' suffixes [Lp, bucket) in
        one pass — batched refills amortize the weight stream the same
        way batched decode does — starting each row from the wave's
        shared-prefix cache when Lp > 0.  The draft variant is
        cache-only (the draft's first proposal comes from feeding the
        target's first token, so its prefill logits are never used)."""
        model = self.draft_model if draft else self.model
        P, max_len = self.prompt_bucket, self.max_len
        S2 = P - Lp
        C = self._fit_chunk(S2, Bp)

        def run(params, prefix_cache, input_ids, position_ids, true_len,
                pixel_patches):
            if Lp:
                cache = [tuple(jnp.repeat(b, Bp, axis=0) for b in layer)
                         for layer in prefix_cache]
            else:
                cache = empty_kv_cache(model.config.text, Bp, max_len,
                                       self.kv_dtype)
            cache = constrain_kv_cache(cache, self.mesh, model.config.text)
            if C and S2 > C:
                hidden, cache = chunked_prefill(
                    model, params, input_ids, position_ids, true_len,
                    pixel_patches, grid_thw, S2, max_len, cache, C,
                    start=Lp)
            else:
                q_idx = Lp + jnp.arange(S2)[None, :, None]
                k_idx = jnp.arange(max_len)[None, None, :]
                mask = jnp.where(
                    (k_idx <= q_idx) & (k_idx < true_len[:, None, None]),
                    0.0, -jnp.inf).astype(jnp.float32)
                hidden, cache = model.apply(
                    {"params": params}, input_ids, position_ids,
                    pixel_patches=pixel_patches, grid_thw=grid_thw,
                    cache=cache, cache_pos=Lp, attn_mask=mask,
                    return_hidden=True)
            if draft:
                return cache
            last_hidden = hidden[jnp.arange(Bp), true_len - 1 - Lp]
            logits = model.apply(
                {"params": params}, last_hidden,
                method=lambda m, h: m.language_model.project(h))
            return cache, logits.astype(jnp.float32)

        return jax.jit(run)

    def _build_insert(self, Bp: int):
        """Scatter Bp freshly prefilled rows into their slots in one
        program.  Sub-batches are exact power-of-2 sizes (refill never
        pads); mode='drop' stays as a backstop against out-of-range
        indices."""
        def run(state, cacheB, logits, pos_base, true_len, slots, keys,
                temp, top_p, d_cacheB=None):
            def scat(buf, rows):
                return buf.at[slots].set(rows, mode="drop")

            cache = [tuple(scat(b, r) for b, r in zip(layer, layerB))
                     for layer, layerB in zip(state["cache"], cacheB)]
            # first token from the prefill logits, with each slot's
            # sampling config (temp <= 0 -> argmax, the greedy path)
            split = jax.vmap(jax.random.split)(keys)
            keys2, subs = split[:, 0], split[:, 1]
            first = sample_rows(logits, subs, temp, top_p)
            out = {
                "cache": cache,
                "cur": scat(state["cur"], first),
                "gen": scat(state["gen"], jnp.zeros((Bp,), jnp.int32)),
                "pos_base": scat(state["pos_base"], pos_base),
                "tl": scat(state["tl"], true_len),
                "key": scat(state["key"], keys2),
                "temp": scat(state["temp"], temp),
                "top_p": scat(state["top_p"], top_p),
                "step0": state["step0"],
            }
            if d_cacheB is not None:
                out["d_cache"] = [
                    tuple(scat(b, r) for b, r in zip(layer, layerB))
                    for layer, layerB in zip(state["d_cache"], d_cacheB)]
            return out

        # donate the old state (and the consumed prefill caches): the
        # update aliases in place instead of doubling the multi-GiB
        # slot KV residency per insert
        if self.draft_model is not None:
            return jax.jit(run, donate_argnums=(0, 1, 9))
        return jax.jit(run, donate_argnums=(0, 1))

    def _build_chunk(self, sampling: bool):
        """One chunk program per mode: the pure-greedy variant skips
        the (B, vocab) sort/filter work entirely; the sampling variant
        serves slots with mixed per-row temperatures.

        Decode KV writes use the UNIFORM-RING layout (ring_decode,
        default): every row writes step s's k/v at physical slot
        ``P + (s mod R)`` where s is a global step counter shared by
        all rows and R = max_len - P.  The write offset is a traced
        SCALAR, so cache_write lowers as dynamic-update-slice — the
        per-row-offset layout lowered all 4 KV-cache writes per layer
        as scatter (+GatherScatterIndicesBitpacked index prep), which
        an optimized-HLO diff + on-chip A/B attributed as the whole
        ~2.6 ms/step continuous-vs-static program tax at 8B
        (BENCH_decode_tax.json, docs/PERF_NOTES.md).  Row validity
        moves into the mask: key slot q holds the row's own token of
        age (s - q) mod R, valid iff that age <= the row's generated
        count — exactly the tokens the per-row layout exposed, so
        streams are token-identical.  A row is device-active for at
        most max_new + 2*chunk = R steps (the existing slack math), so
        the ring never overwrites a live token."""
        P, max_len, eos = self.prompt_bucket, self.max_len, self.eos_token_id
        B = self.n_slots
        R = max_len - P

        def run(params, state, active):
            tl, pos_base = state["tl"], state["pos_base"]
            temp, top_p = state["temp"], state["top_p"]
            step0 = state["step0"]

            def step(carry, i):
                cache, cur, gen, act, keys = carry
                pos = jnp.broadcast_to(
                    (pos_base + gen)[None, :, None], (3, B, 1))
                k_idx = jnp.arange(max_len)[None, None, :]
                if self.ring_decode:
                    s = step0 + i
                    age = jnp.mod(s - (k_idx - P), R)
                    mask = jnp.where(
                        (k_idx < tl[:, None, None])
                        | ((k_idx >= P) & (age <= gen[:, None, None])),
                        0.0, -jnp.inf).astype(jnp.float32)
                    write_pos = P + jnp.mod(s, R)       # scalar -> DUS
                else:
                    mask = jnp.where(
                        (k_idx < tl[:, None, None])
                        | ((k_idx >= P)
                           & (k_idx <= (P + gen)[:, None, None])),
                        0.0, -jnp.inf).astype(jnp.float32)
                    write_pos = P + gen                 # (B,) -> scatter
                logits, cache = self.model.apply(
                    {"params": params}, cur[:, None], pos,
                    cache=cache, cache_pos=write_pos, attn_mask=mask)
                if sampling:
                    split = jax.vmap(jax.random.split)(keys)
                    keys, subs = split[:, 0], split[:, 1]
                    nxt = sample_rows(logits[:, -1], subs, temp, top_p)
                else:
                    nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                # same ordering as Qwen3VLGenerator.step: emit cur,
                # then freeze rows whose emitted token was eos
                act = act & (cur != eos)
                nxt = jnp.where(act, nxt, eos)
                gen = jnp.where(act, gen + 1, gen)
                return (cache, nxt, gen, act, keys), cur

            (cache, cur, gen, _, keys), toks = jax.lax.scan(
                step, (state["cache"], state["cur"], state["gen"], active,
                       state["key"]),
                jnp.arange(self.chunk))
            new_state = {"cache": cache, "cur": cur, "gen": gen,
                         "pos_base": pos_base, "tl": tl, "key": keys,
                         "temp": temp, "top_p": top_p,
                         "step0": step0 + self.chunk}
            return new_state, toks.swapaxes(0, 1)  # (B, chunk)

        # donate the state: the chunk updates the KV cache in place
        # instead of allocating a second multi-GiB copy per chunk
        return jax.jit(run, donate_argnums=(1,))

    def _build_spec_chunk(self, sampling: bool = False):
        """``chunk`` draft-k/verify-1 cycles over all slots in one jit.

        Per cycle: the draft decodes ``spec_k + 1`` single-token steps
        for every slot (feeding the pending token then its own
        proposals), the target verifies each slot's (pending + k
        proposals) chunk in ONE k+1-token forward at per-slot cache
        offsets, and the acceptance rule advances each slot by
        1..spec_k+1 verified tokens.  Rejected cache positions are
        never exposed (masks bound reads by the verified depth) and are
        overwritten by later cycles — the batched form of
        models/speculative.py's mask-out-instead-of-rollback.  Returns
        per-cycle (emitted (B, chunk, k+1), n_acc (B, chunk)); the host
        emits ``emitted[..., :n_acc+1]``.

        ``sampling=False`` is the pure-greedy variant: draft proposes
        its argmax, acceptance is the longest argmax-matching prefix
        (lossless — each slot's stream is exactly the target's greedy
        decode).  ``sampling=True`` serves slots with mixed per-row
        temperatures through rejection sampling
        (models/qwen3_vl.spec_accept): proposals are sampled from the
        draft's filtered distribution and the emitted stream is
        distributed exactly as target-only sampling; temp<=0 rows
        degenerate to point masses and stay token-exact greedy.
        """
        P, max_len, eos = self.prompt_bucket, self.max_len, self.eos_token_id
        B, k = self.n_slots, self.spec_k

        def run(params, dparams, state, active):
            tl, pos_base = state["tl"], state["pos_base"]
            temp, top_p = state["temp"], state["top_p"]
            k_idx = jnp.arange(max_len)[None, None, :]

            def cycle(carry, _):
                cache, d_cache, cur, gen, act, keys = carry

                # -- draft: k+1 single-token steps across all slots
                # (the +1 feed keeps the draft cache ahead when every
                # proposal is accepted)
                def dstep(c, i):
                    d_cache, tok, keys = c
                    g = gen + i
                    pos = jnp.broadcast_to(
                        (pos_base + g)[None, :, None], (3, B, 1))
                    mask = jnp.where(
                        (k_idx < tl[:, None, None])
                        | ((k_idx >= P) & (k_idx <= (P + g)[:, None, None])),
                        0.0, -jnp.inf).astype(jnp.float32)
                    logits, d_cache = self.draft_model.apply(
                        {"params": dparams}, tok[:, None], pos,
                        cache=d_cache, cache_pos=P + g, attn_mask=mask)
                    if sampling:
                        q_lp = filtered_log_probs(logits[:, -1], temp, top_p)
                        split = jax.vmap(jax.random.split)(keys)
                        keys, subs = split[:, 0], split[:, 1]
                        nxt = jax.vmap(jax.random.categorical)(
                            subs, q_lp).astype(jnp.int32)
                        return (d_cache, nxt, keys), (nxt, q_lp)
                    nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                    return (d_cache, nxt, keys), nxt

                (d_cache, _, keys), d_out = jax.lax.scan(
                    dstep, (d_cache, cur, keys), jnp.arange(k + 1))
                if sampling:
                    drafts = d_out[0][:k].T         # (B, k) proposals
                    q_lp = d_out[1][:k].swapaxes(0, 1)  # (B, k, V)
                else:
                    drafts = d_out[:k].T

                # -- target verifies [cur, d_1..d_k] per slot in ONE
                # (B, k+1)-token forward at per-slot cache offsets
                chunk_toks = jnp.concatenate([cur[:, None], drafts], axis=1)
                gen_idx = gen[:, None] + jnp.arange(k + 1)[None, :]  # (B,k+1)
                pos = jnp.broadcast_to(
                    (pos_base[:, None] + gen_idx)[None], (3, B, k + 1))
                hi = (P + gen_idx)[:, :, None]
                mask = jnp.where(
                    (k_idx < tl[:, None, None])
                    | ((k_idx >= P) & (k_idx <= hi)),
                    0.0, -jnp.inf).astype(jnp.float32)
                logits, cache = self.model.apply(
                    {"params": params}, chunk_toks, pos,
                    cache=cache, cache_pos=P + gen, attn_mask=mask)

                if sampling:
                    V = logits.shape[-1]
                    p_lp = filtered_log_probs(
                        logits.reshape(B * (k + 1), V),
                        jnp.repeat(temp, k + 1),
                        jnp.repeat(top_p, k + 1)).reshape(B, k + 1, V)
                    split = jax.vmap(jax.random.split)(keys)
                    keys, subs = split[:, 0], split[:, 1]
                    emitted, n_acc = spec_accept(drafts, q_lp, p_lp, subs)
                else:
                    emitted = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    # greedy acceptance: longest prefix with
                    # d_j == tau_{j-1}
                    match = (drafts == emitted[:, :k]).astype(jnp.int32)
                    n_acc = jnp.argmin(jnp.cumprod(match, axis=1), axis=1)
                    n_acc = jnp.where(match.all(axis=1), k, n_acc)

                # freeze: a row whose pending token was eos stays
                # frozen (mirrors the greedy chunk's emit-then-freeze),
                # and a row emitting eos among its accepted tokens
                # freezes for later cycles
                act = act & (cur != eos)
                valid = jnp.arange(k + 1)[None, :] <= n_acc[:, None]
                hit_eos = jnp.any(valid & (emitted == eos), axis=1)
                emitted = jnp.where(act[:, None], emitted, eos)
                n_acc = jnp.where(act, n_acc, 0)
                new_cur = jnp.where(
                    act, jnp.take_along_axis(
                        emitted, n_acc[:, None], axis=1)[:, 0], eos)
                gen = jnp.where(act, gen + n_acc + 1, gen)
                act = act & ~hit_eos
                return ((cache, d_cache, new_cur, gen, act, keys),
                        (emitted, n_acc))

            (cache, d_cache, cur, gen, _, keys), (toks, accs) = jax.lax.scan(
                cycle, (state["cache"], state["d_cache"], state["cur"],
                        state["gen"], active, state["key"]),
                None, length=self.chunk)
            new_state = dict(state, cache=cache, d_cache=d_cache, cur=cur,
                             gen=gen, key=keys)
            # (B, chunk, k+1) emissions and (B, chunk) acceptance counts
            return new_state, toks.swapaxes(0, 1), accs.swapaxes(0, 1)

        return jax.jit(run, donate_argnums=(2,))

    # -- host scheduler ------------------------------------------------------

    def _prefill_inputs(self, req: dict):
        """Host-side suffix inputs for one request: ids/positions over
        [wave prefix, bucket), full-sequence true length, and the
        host-computed pos_base (max m-rope position + 1)."""
        ids = np.asarray(req["input_ids"])
        if ids.ndim == 1:
            ids = ids[None]
        if ids.shape[0] != 1:
            raise ValueError("one request = one row; batching is the "
                             "batcher's job")
        seq_len = ids.shape[1]
        if seq_len > self.prompt_bucket:
            raise ValueError(
                f"prompt length {seq_len} exceeds the serving bucket "
                f"{self.prompt_bucket}")
        grid_thw = tuple(tuple(int(x) for x in g)
                         for g in req.get("grid_thw", ()) or ())
        position_ids = compute_mrope_position_ids(
            ids, grid_thw, self.config.image_token_id,
            self.config.vision.spatial_merge_size)
        pos_base = int(position_ids.max()) + 1
        if seq_len < self.prompt_bucket:
            pad = self.prompt_bucket - seq_len
            ids = np.pad(ids, [(0, 0), (0, pad)])
            position_ids = np.pad(position_ids, [(0, 0), (0, 0), (0, pad)])
        Lp = self._wave_lp
        patches = req.get("pixel_patches")
        return (grid_thw, ids[:, Lp:], position_ids[:, :, Lp:],
                seq_len, pos_base,
                np.asarray(patches) if patches is not None else None)

    @staticmethod
    def _grid_key(req: dict):
        return tuple(tuple(int(x) for x in g)
                     for g in req.get("grid_thw", ()) or ())

    def _prefill_batch(self, rows: List[tuple], Bp: int, draft: bool):
        """Run one batched suffix prefill over Bp prepared
        ``_prefill_inputs`` rows (the caller pads the group to Bp)."""
        grid_row = rows[0][0]
        ids = jnp.asarray(np.concatenate([r[1] for r in rows], axis=0))
        pos = jnp.asarray(np.concatenate([r[2] for r in rows], axis=1))
        tl = jnp.asarray([r[3] for r in rows], jnp.int32)
        patches = None
        if rows[0][5] is not None:
            patches = jnp.asarray(
                np.concatenate([r[5] for r in rows], axis=0))
        grid_thw = grid_row * Bp
        key = (grid_thw, self._wave_lp, Bp, draft)
        if key not in self._prefill_fns:
            self._prefill_fns[key] = self._build_prefill(
                grid_thw, self._wave_lp, Bp, draft=draft)
        params = self.draft_params if draft else self.params
        prefix = self._wave_draft_prefix if draft else self._wave_prefix
        return self._prefill_fns[key](params, prefix, ids, pos, tl,
                                      patches)

    def _prefill_shared_prefix(self, requests: Sequence[dict]):
        """Per-wave shared-prefix setup: detect the common prefix and
        prefill it once for the target (and draft) model."""
        self._wave_lp = self._shared_prefix_len(requests)
        self._wave_prefix = self._wave_draft_prefix = None
        if not self._wave_lp:
            return
        Lp = self._wave_lp
        ids = np.asarray(requests[0]["input_ids"]).reshape(1, -1)[:, :Lp]
        # the prefix is image-free by construction, so its m-rope
        # positions are a pure function of the prefix tokens — identical
        # standalone and inside every request's full sequence
        pos = compute_mrope_position_ids(
            ids, (), self.config.image_token_id,
            self.config.vision.spatial_merge_size)
        ids, pos = jnp.asarray(ids), jnp.asarray(pos)
        for draft in ([False, True] if self.draft_model is not None
                      else [False]):
            key = (Lp, draft)
            if key not in self._prefix_fns:
                self._prefix_fns[key] = self._build_prefix(Lp, draft=draft)
            cache = self._prefix_fns[key](
                self.draft_params if draft else self.params, ids, pos)
            if draft:
                self._wave_draft_prefix = cache
            else:
                self._wave_prefix = cache

    def serve(self, requests: Sequence[dict],
              max_new_tokens: Optional[int] = None) -> List[np.ndarray]:
        """Run every request through the slot server; returns, in
        request order, each request's token array shaped like the plain
        generator's output row ((max_new,) eos-padded after stop).

        Request dicts: ``input_ids`` (1, S) or (S,); optional
        ``pixel_patches``/``grid_thw``; optional per-request
        ``max_new_tokens``, ``temperature`` (default 0 = greedy),
        ``top_p`` and ``seed`` — slots with mixed temperatures serve
        together (the VLM-direct multi-temperature protocol runs as one
        stream); greedy rows still match the plain generator exactly.
        """
        sampling = any(float(r.get("temperature") or 0.0) > 0
                       for r in requests)
        spec = self.draft_model is not None
        key = ("spec", sampling) if spec else sampling
        if key not in self._chunk_fns:
            self._chunk_fns[key] = (self._build_spec_chunk(sampling) if spec
                                    else self._build_chunk(sampling))
        chunk_fn = self._chunk_fns[key]
        if self._state is None:
            self._state = self._init_state()
        self._prefill_shared_prefix(requests)
        # resolve the refill-batch policy for THIS wave's suffix length
        # (see __init__): short suffixes batch, long suffixes serialize
        if self._refill_batch_arg is not None:
            rb = int(self._refill_batch_arg)
        elif self.prompt_bucket - self._wave_lp <= _BATCH_REFILL_MAX_SUFFIX:
            per_row = self._kv_bytes_per_row()
            if self.draft_model is not None:
                per_row += self._kv_bytes_per_row(
                    self.draft_model.config.text)
            rb = max(1, _REFILL_KV_BUDGET // per_row)
        else:
            rb = 1
        self.refill_batch = max(1, min(rb, self.n_slots))
        default_new = max_new_tokens or self.max_new_tokens
        budgets = [min(int(r.get("max_new_tokens") or default_new),
                       self.max_new_tokens) for r in requests]

        emitted: List[List[int]] = [[] for _ in requests]
        done = [False] * len(requests)
        slot_req: List[Optional[int]] = [None] * self.n_slots
        active = np.zeros((self.n_slots,), bool)
        queue = list(range(len(requests)))

        def refill():
            # Batched refills: the head-of-queue run with one image
            # layout prefills together — one weight stream for up to
            # refill_batch suffix prefills instead of one per request
            # (the initial fill is the big win).  Groups dispatch in
            # EXACT power-of-2 sub-batches (4+2+1, largest first):
            # compile count stays logarithmic and no row is ever a pad
            # — prefill compute is ~linear in rows at long buckets, so
            # a padded row would cost a full wasted row-prefill.
            while queue:
                free = [s for s in range(self.n_slots)
                        if slot_req[s] is None]
                if not free:
                    return
                g0 = self._grid_key(requests[queue[0]])
                take = [queue.pop(0)]
                cap = min(len(free), self.refill_batch)
                while (queue and len(take) < cap
                       and self._grid_key(requests[queue[0]]) == g0):
                    take.append(queue.pop(0))
                while take:
                    Bp = 1 << (len(take).bit_length() - 1)  # pow2 floor
                    sub, take = take[:Bp], take[Bp:]
                    rows = [self._prefill_inputs(requests[r]) for r in sub]
                    cacheB, logits = self._prefill_batch(rows, Bp,
                                                         draft=False)
                    slots = free[:Bp]
                    free = free[Bp:]
                    keys = jnp.stack([
                        jax.random.PRNGKey(int(
                            requests[r]["seed"]
                            if requests[r].get("seed") is not None else r))
                        for r in sub])
                    args = [self._state, cacheB, logits,
                            jnp.asarray([r[4] for r in rows], jnp.int32),
                            jnp.asarray([min(r[3], self.prompt_bucket)
                                         for r in rows], jnp.int32),
                            jnp.asarray(slots, jnp.int32), keys,
                            jnp.asarray(
                                [float(requests[r].get("temperature")
                                       or 0.0) for r in sub], jnp.float32),
                            jnp.asarray(
                                [float(requests[r].get("top_p") or 1.0)
                                 for r in sub], jnp.float32)]
                    if spec:
                        args.append(self._prefill_batch(rows, Bp,
                                                        draft=True))
                    if Bp not in self._insert_fns:
                        self._insert_fns[Bp] = self._build_insert(Bp)
                    self._state = self._insert_fns[Bp](*args)
                    if spec:
                        # the spec chunk emits only post-verify tokens,
                        # so each prefill's first token — sampled by the
                        # insert program with the slot's temp/top_p/key
                        # (argmax for greedy rows) — is emitted here;
                        # one readback per refill sub-batch
                        firsts = np.asarray(self._state["cur"])
                        for i, r in enumerate(sub):
                            first = int(firsts[slots[i]])
                            emitted[r].append(first)
                            if (first == self.eos_token_id
                                    or len(emitted[r]) >= budgets[r]):
                                done[r] = True
                                # hand the freed slot back for the next
                                # sub-batch / queue pass
                                free.append(slots[i])
                                continue
                            slot_req[slots[i]] = r
                            active[slots[i]] = True
                    else:
                        for i, r in enumerate(sub):
                            slot_req[slots[i]] = r
                            active[slots[i]] = True

        def emit_row(r, tokens) -> bool:
            for t in tokens:
                t = int(t)
                emitted[r].append(t)
                if (t == self.eos_token_id
                        or len(emitted[r]) >= budgets[r]):
                    done[r] = True
                    return True
            return False

        def dispatch():
            if spec:
                self._state, toks, accs = chunk_fn(
                    self.params, self.draft_params, self._state,
                    jnp.asarray(active))
                return toks, accs
            self._state, toks = chunk_fn(
                self.params, self._state, jnp.asarray(active))
            return toks, None

        per_iter = self.spec_k + 1 if spec else 1

        def lookahead_ok() -> bool:
            # Dispatch the NEXT chunk before blocking on this chunk's
            # readback, hiding one host<->device round trip per chunk
            # (~30 ms relay RTT / chunk steps — the dominant continuous
            # tax; the per-row KV scatter measured free,
            # BENCH_scatter.json).  Tokens are processed against the
            # slot map SNAPSHOT taken at dispatch, so a slot refilled
            # while its lookahead was in flight never mis-credits the
            # old row's tokens; the new request simply joins one chunk
            # later.  Main phase: skip the lookahead when some slot's
            # budget expires within this chunk (its refill would be
            # delayed a whole chunk — worse than one RTT).  Tail phase
            # (empty queue): worth it while any slot outlives both
            # unread chunks.
            rem = [budgets[r] - len(emitted[r])
                   for r in slot_req if r is not None]
            if not rem:
                return False
            if queue:
                return min(rem) > self.chunk * per_iter
            return max(rem) > 2 * self.chunk * per_iter

        try:
            refill()
            pending = None  # (chunk outputs, dispatch-time slot map)
            while any(r is not None for r in slot_req):
                if pending is not None:
                    (cur, snap), pending = pending, None
                else:
                    snap = list(slot_req)
                    cur = dispatch()
                # NOTE: a finished slot stays device-active through an
                # already-dispatched lookahead, writing KV one chunk
                # deeper — max_len carries 2*chunk*per_iter slack for
                # exactly this (see __init__); keep the two in sync.
                # A refill insert enqueued after the lookahead applies
                # to the lookahead's OUTPUT state (async dispatch
                # order), so the map change never races the chunk.
                if lookahead_ok():
                    pending = (dispatch(), list(slot_req))
                toks, accs = cur
                if spec:
                    toks = np.asarray(toks)   # (n_slots, chunk, k+1)
                    accs = np.asarray(accs)   # (n_slots, chunk)
                else:
                    toks = np.asarray(toks)[:, :, None]  # (B, chunk, 1)
                    accs = np.zeros(toks.shape[:2], np.int64)
                for s in range(self.n_slots):
                    r = snap[s]
                    if r is None or done[r]:
                        continue  # frozen rows emit masked eos padding
                    for c in range(toks.shape[1]):
                        if emit_row(r, toks[s, c, :int(accs[s, c]) + 1]):
                            break
                    if done[r] and slot_req[s] == r:
                        slot_req[s] = None
                        active[s] = False
                refill()
            # a leftover lookahead at stream end is dead work by
            # construction (every request is done; its rows are frozen)
        finally:
            # Release the slot state (KV caches — multi-GiB at 8B) and
            # the wave's shared-prefix caches between waves, on failure
            # too: a long-lived backend keeps one batcher per prompt
            # bucket, and drained batchers must not pin HBM.  Compiled
            # programs stay cached; the next serve() re-zeros the state.
            self._state = None
            self._wave_prefix = self._wave_draft_prefix = None
            self._wave_lp = 0

        out = []
        for r, toks_r in enumerate(emitted):
            row = np.full((budgets[r],), self.eos_token_id, np.int64)
            row[:len(toks_r)] = toks_r[:budgets[r]]
            # eos-pad after the first eos, like Qwen3VLGenerator
            hits = np.where(row == self.eos_token_id)[0]
            if len(hits):
                row[hits[0]:] = self.eos_token_id
            out.append(row)
        return out
