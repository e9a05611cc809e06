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
- Prefill is a separate B=1 jit per image-grid layout (the plain
  generator's compile key), writing a full-length single-row cache
  that is spliced into the slot axis with a dynamic_update_slice.

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
    compute_mrope_position_ids,
    empty_kv_cache,
    sample_rows,
)


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
                 chunk: int = 16):
        self.model = model
        self.params = params
        self.config = model.config
        self.n_slots = int(n_slots)
        self.prompt_bucket = int(prompt_bucket)
        self.max_new_tokens = int(max_new_tokens)
        self.eos_token_id = int(eos_token_id)
        if kv_dtype not in ("bf16", "int8"):
            raise ValueError(f"kv_dtype must be bf16 or int8: {kv_dtype}")
        self.kv_dtype = kv_dtype
        self.chunk = int(chunk)
        # chunk slack: a row that hits its budget right after a chunk
        # boundary keeps writing garbage KV until the host deactivates
        # it at the next boundary
        self.max_len = self.prompt_bucket + self.max_new_tokens + self.chunk
        self._prefill_fns: Dict = {}
        self._insert_fn = None
        self._chunk_fns: Dict[bool, object] = {}
        self._state = None

    # -- device state -------------------------------------------------------

    def _init_state(self):
        B = self.n_slots
        cache = empty_kv_cache(self.config.text, B, self.max_len,
                               self.kv_dtype)
        return {
            "cache": cache,
            "cur": jnp.full((B,), self.eos_token_id, jnp.int32),
            "gen": jnp.zeros((B,), jnp.int32),
            "pos_base": jnp.zeros((B,), jnp.int32),
            "tl": jnp.ones((B,), jnp.int32),
            # per-slot sampling state (temp <= 0 rows decode greedy)
            "key": jax.random.split(jax.random.PRNGKey(0), B),
            "temp": jnp.zeros((B,), jnp.float32),
            "top_p": jnp.ones((B,), jnp.float32),
        }

    # -- compiled programs ---------------------------------------------------

    def _build_prefill(self, grid_thw):
        P, max_len = self.prompt_bucket, self.max_len

        def run(params, input_ids, position_ids, true_len, pixel_patches):
            cache = empty_kv_cache(self.config.text, 1, max_len,
                                   self.kv_dtype)
            q_idx = jnp.arange(P)[None, :, None]
            k_idx = jnp.arange(max_len)[None, None, :]
            mask = jnp.where(
                (k_idx <= q_idx) & (k_idx < true_len[:, None, None]),
                0.0, -jnp.inf).astype(jnp.float32)
            hidden, cache = self.model.apply(
                {"params": params}, input_ids, position_ids,
                pixel_patches=pixel_patches, grid_thw=grid_thw,
                cache=cache, cache_pos=0, attn_mask=mask,
                return_hidden=True)
            last_hidden = hidden[jnp.arange(1), true_len - 1]
            logits = self.model.apply(
                {"params": params}, last_hidden,
                method=lambda m, h: m.language_model.project(h))
            pos_base = (position_ids.max(axis=(0, 2)) + 1).astype(jnp.int32)
            return cache, logits.astype(jnp.float32), pos_base

        return jax.jit(run)

    def _build_insert(self):
        def run(state, cache1, logits, pos_base, true_len, slot, key,
                temp, top_p):
            cache = [
                tuple(jax.lax.dynamic_update_slice(
                    buf, one, (slot,) + (0,) * (buf.ndim - 1))
                    for buf, one in zip(layer, layer1))
                for layer, layer1 in zip(state["cache"], cache1)]
            # first token from the prefill logits, with the slot's
            # sampling config (temp <= 0 -> argmax, the greedy path)
            key0, key = jax.random.split(key)
            first = sample_rows(logits, key0[None], temp[None],
                                top_p[None])[0]
            return {
                "cache": cache,
                "cur": state["cur"].at[slot].set(first),
                "gen": state["gen"].at[slot].set(0),
                "pos_base": state["pos_base"].at[slot].set(pos_base[0]),
                "tl": state["tl"].at[slot].set(true_len[0]),
                "key": state["key"].at[slot].set(key),
                "temp": state["temp"].at[slot].set(temp),
                "top_p": state["top_p"].at[slot].set(top_p),
            }

        # donate the old state (and the consumed 1-slot prefill cache):
        # the update aliases in place instead of doubling the multi-GiB
        # slot KV residency per insert
        return jax.jit(run, donate_argnums=(0, 1))

    def _build_chunk(self, sampling: bool):
        """One chunk program per mode: the pure-greedy variant skips
        the (B, vocab) sort/filter work entirely; the sampling variant
        serves slots with mixed per-row temperatures."""
        P, max_len, eos = self.prompt_bucket, self.max_len, self.eos_token_id
        B = self.n_slots

        def run(params, state, active):
            tl, pos_base = state["tl"], state["pos_base"]
            temp, top_p = state["temp"], state["top_p"]

            def step(carry, _):
                cache, cur, gen, act, keys = carry
                pos = jnp.broadcast_to(
                    (pos_base + gen)[None, :, None], (3, B, 1))
                k_idx = jnp.arange(max_len)[None, None, :]
                mask = jnp.where(
                    (k_idx < tl[:, None, None])
                    | ((k_idx >= P) & (k_idx <= (P + gen)[:, None, None])),
                    0.0, -jnp.inf).astype(jnp.float32)
                logits, cache = self.model.apply(
                    {"params": params}, cur[:, None], pos,
                    cache=cache, cache_pos=P + gen, attn_mask=mask)
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
                None, length=self.chunk)
            new_state = {"cache": cache, "cur": cur, "gen": gen,
                         "pos_base": pos_base, "tl": tl, "key": keys,
                         "temp": temp, "top_p": top_p}
            return new_state, toks.swapaxes(0, 1)  # (B, chunk)

        # donate the state: the chunk updates the KV cache in place
        # instead of allocating a second multi-GiB copy per chunk
        return jax.jit(run, donate_argnums=(1,))

    # -- host scheduler ------------------------------------------------------

    def _prefill(self, req: dict):
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
        if seq_len < self.prompt_bucket:
            pad = self.prompt_bucket - seq_len
            ids = np.pad(ids, [(0, 0), (0, pad)])
            position_ids = np.pad(position_ids, [(0, 0), (0, 0), (0, pad)])
        if grid_thw not in self._prefill_fns:
            self._prefill_fns[grid_thw] = self._build_prefill(grid_thw)
        patches = req.get("pixel_patches")
        patches = jnp.asarray(patches) if patches is not None else None
        return self._prefill_fns[grid_thw](
            self.params, jnp.asarray(ids), jnp.asarray(position_ids),
            jnp.asarray([seq_len], jnp.int32), patches)

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
        if self._insert_fn is None:
            self._insert_fn = self._build_insert()
        sampling = any(float(r.get("temperature") or 0.0) > 0
                       for r in requests)
        if sampling not in self._chunk_fns:
            self._chunk_fns[sampling] = self._build_chunk(sampling)
        chunk_fn = self._chunk_fns[sampling]
        if self._state is None:
            self._state = self._init_state()
        default_new = max_new_tokens or self.max_new_tokens
        budgets = [min(int(r.get("max_new_tokens") or default_new),
                       self.max_new_tokens) for r in requests]

        emitted: List[List[int]] = [[] for _ in requests]
        done = [False] * len(requests)
        slot_req: List[Optional[int]] = [None] * self.n_slots
        active = np.zeros((self.n_slots,), bool)
        queue = list(range(len(requests)))

        def refill():
            for s in range(self.n_slots):
                if slot_req[s] is None and queue:
                    r = queue.pop(0)
                    req = requests[r]
                    cache1, logits, pos_base = self._prefill(req)
                    tl = jnp.asarray(
                        [min(np.asarray(req["input_ids"]).reshape(
                            1, -1).shape[1], self.prompt_bucket)],
                        jnp.int32)
                    self._state = self._insert_fn(
                        self._state, cache1, logits, pos_base, tl,
                        jnp.int32(s),
                        jax.random.PRNGKey(int(
                            req["seed"] if req.get("seed") is not None
                            else r)),
                        jnp.float32(float(req.get("temperature") or 0.0)),
                        jnp.float32(float(req.get("top_p") or 1.0)))
                    slot_req[s] = r
                    active[s] = True

        try:
            refill()
            while any(r is not None for r in slot_req):
                self._state, toks = chunk_fn(
                    self.params, self._state, jnp.asarray(active))
                toks = np.asarray(toks)  # (n_slots, chunk)
                for s in range(self.n_slots):
                    r = slot_req[s]
                    if r is None:
                        continue
                    for t in toks[s]:
                        t = int(t)
                        emitted[r].append(t)
                        if (t == self.eos_token_id
                                or len(emitted[r]) >= budgets[r]):
                            done[r] = True
                            break
                    if done[r]:
                        slot_req[s] = None
                        active[s] = False
                refill()
        finally:
            # Release the slot state (KV caches — multi-GiB at 8B)
            # between waves, on failure too: a long-lived backend keeps
            # one batcher per prompt bucket, and drained batchers must
            # not pin HBM.  Compiled programs stay cached; the next
            # serve() re-zeros the state.
            self._state = None

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
