"""Qwen3-VL generation backend — the production judge engine.

Implements the VLMBackend protocol (judge/backends.py) on the JAX
Qwen3-VL model (models/qwen3_vl.py): chat-template the prompt +
images, patchify through the Qwen image processor, run
prefill + scan-decode generation, decode text.

Capability parity: the reference's torch generate path used by
vlm_audit_module.py:249-364, utils/vlm_review.py:164-258 and
qwen3_llm.py:83-130 (temperature>0 toggles sampling).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from emr2a_tpu.models.qwen3_vl import (
    Qwen3VLGenerator,
    Qwen3VLModel,
    convert_hf_qwen3_vl,
    qwen3_vl_config_from_hf,
)

logger = logging.getLogger(__name__)


def _load_qwen3_vl(model_path, config=None, params=None,
                   cache_params: bool = True):
    from emr2a_tpu.models.checkpoint import load_qwen3_vl
    return load_qwen3_vl(model_path, config, params, cache_params)


def _calib_ids_from_tokenizer(tokenizer, vocab_size: int,
                              batch: int = 4, seq: int = 256):
    """Calibration token batch for AWQ: the judge's own audit/review
    instruction templates (in-domain text — the serving distribution),
    tokenized and wrap-tiled to (batch, seq).  Falls back to random ids
    when the tokenizer can't produce enough tokens (fake tokenizers in
    tests)."""
    texts = []
    try:
        from emr2a_tpu.judge import prompts as _p
        for name in dir(_p):
            v = getattr(_p, name)
            if isinstance(v, str) and len(v) > 200:
                texts.append(v)
    except Exception:
        pass
    ids: List[int] = []
    for t in texts:
        try:
            ids.extend(tokenizer(t, add_special_tokens=False)["input_ids"])
        except Exception:
            break
    if len(ids) < batch * seq:
        rng = np.random.RandomState(0)
        pad = rng.randint(2, max(3, vocab_size - 2),
                          (batch * seq - len(ids),)).tolist()
        ids = ids + pad
    arr = np.asarray(ids[:batch * seq], np.int64).reshape(batch, seq)
    return arr


def _quantize_decoder(params, precision: str, model=None, tokenizer=None):
    """W8A8 / W4A8-quantize the language-model projections in place."""
    if precision == "int4":
        logger.warning(
            "precision=int4 is EXPERIMENTAL: group-128 4-bit RTN weights "
            "carry a real accuracy cost (~0.993 cosine per projection; "
            "decision invariance is pinned only at tiny geometry) — "
            "validate audit quality on your cohort, use int4_awq "
            "(activation-aware folding, models/awq.py) to claw back "
            "most of the RTN error, or use int8, the accuracy-safe "
            "fast path")
    if precision == "int4_awq":
        if model is None:
            raise ValueError("int4_awq needs the model for calibration")
        from emr2a_tpu.models.awq import awq_quantize_qwen_text_params
        calib = _calib_ids_from_tokenizer(
            tokenizer, model.config.text.vocab_size)
        out, report = awq_quantize_qwen_text_params(
            model, params, calib, return_report=True)
        taken = [e["alpha"][s] for e in report.values()
                 for s in ("qkv", "o", "gu", "down")]
        logger.info("int4_awq: calibrated on %d tokens; alpha>0 at "
                    "%d/%d sites", calib.size,
                    sum(1 for a in taken if a > 0), len(taken))
        return out
    if precision in ("int8", "int4"):
        from emr2a_tpu.models.quantize import quantize_qwen_text_params
        return {**params, "language_model":
                quantize_qwen_text_params(params["language_model"],
                                          precision=precision)}
    if precision != "bf16":
        raise ValueError(
            f"precision must be bf16|int8|int4|int4_awq, got {precision!r}")
    return params


class QwenVLBackend:

    def __init__(self, model_path: str, device: str = "tpu",
                 config=None, params=None, tokenizer=None,
                 image_processor=None, prompt_bucket: int = 128,
                 cache_params: bool = True, precision: str = "bf16",
                 standardize_images: Optional[int] = None,
                 kv_dtype: str = "bf16",
                 draft_model_path: Optional[str] = None,
                 draft_config=None, draft_params=None, spec_k: int = 4,
                 decode_chunk: Optional[int] = 64,
                 prefill_chunk: Optional[int] = None,
                 tp: int = 1):
        """``precision="int8"`` quantizes the decoder projections W8A8
        (models/quantize.quantize_qwen_text_params) — decode is weight-
        bandwidth-bound, int8 nearly halves the stream; tiny-model
        logit corr vs bf16 >= 0.9997, top-1 agreement 1.0.
        ``precision="int4"`` uses group-128 4-bit weights
        (ops/linear_int4) — halves the decode stream again; RTN 4-bit
        carries real accuracy cost, so int8 stays the accuracy-safe
        default recommendation for the judge.  ``precision="int4_awq"``
        adds activation-aware weight-scale folding (models/awq.py):
        per-channel scales calibrated on the judge's own prompt
        templates fold EXACTLY into adjacent params (norm scales /
        v_proj / up_proj columns), so serving kernels and speed are
        identical to int4 while the quantization grid tracks the loud
        activation channels.

        ``standardize_images=N`` resizes every input image to NxN before
        patchify, pinning the vision grid: each distinct grid layout is
        a separate XLA compile, so mixed-resolution corpora (or batched
        serving over them) otherwise recompile per layout.

        ``kv_dtype="int8"`` stores the KV cache s8 with per-(position,
        head) scales folded into the attention math — halves KV
        residency/stream, doubling batched-serving KV headroom.

        ``draft_model_path`` (or ``draft_config/draft_params`` directly)
        enables greedy speculative decoding (models/speculative.py): a
        small same-vocabulary draft (the 2B judge drafting for the
        flagship 8B, /root/reference/encoders/
        qwen3_vl_8b_thinking_encoder.py:30-43) proposes ``spec_k``
        tokens per cycle and the target verifies them in one forward.
        Lossless — the emitted stream is exactly the target's greedy
        decode.  Used for single-request greedy generate(); sampling
        and generate_batch fall back to the plain generator.

        ``decode_chunk`` (default 64) decodes in chunks with host-side
        early exit: short answers under a long max_new budget stop
        paying the weight stream at their real length (bit-identical
        tokens — Qwen3VLGenerator.generate(chunk=...)).  None restores
        the one-shot scan.

        ``prefill_chunk=C`` runs the prompt through the decoder in
        C-token slices (models/qwen3_vl.chunked_prefill, bit-identical
        output), bounding the (B, heads, S, L) f32 attention temps that
        otherwise OOM large-batch (B>=16 at 8B) or long-bucket
        prefill.

        ``tp=N`` serves tensor-parallel over N chips: params sharded
        Megatron-style over a mesh ``model`` axis
        (training/sharding_rules.py) and KV caches sharded on the
        kv-head axis (models/qwen3_vl.kv_cache_sharding_specs), for
        both the plain generator and every continuous batcher.  The
        bf16 8B judge (16.1 GiB params) needs tp>=2 on 16 GiB v5e
        chips; token streams are identical to tp=1
        (tests/test_serving_tp.py)."""
        self.model_path = model_path
        self.prompt_bucket = prompt_bucket
        self.standardize_images = standardize_images
        self.decode_chunk = decode_chunk
        self.prefill_chunk = prefill_chunk
        config, params = _load_qwen3_vl(model_path, config, params,
                                        cache_params)
        if tokenizer is None and model_path is not None:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(str(model_path))
        if image_processor is None and model_path is not None:
            # the checkpoint's preprocessor_config.json is authoritative
            # (normalization statistics differ across releases)
            try:
                from transformers import AutoImageProcessor
                image_processor = AutoImageProcessor.from_pretrained(
                    str(model_path))
            except Exception:
                image_processor = None
        if image_processor is None:
            from emr2a_tpu.encoders.qwen3_vl_encoder import make_image_processor
            image_processor = make_image_processor(config.vision)
        self.model = Qwen3VLModel(config)
        params = _quantize_decoder(params, precision, model=self.model,
                                   tokenizer=tokenizer)
        self.mesh = None
        if tp and int(tp) > 1:
            import jax
            from emr2a_tpu.parallel.mesh import create_mesh
            from emr2a_tpu.training import param_shardings
            n = len(jax.devices())
            if n % int(tp):
                raise ValueError(f"tp={tp} does not divide the "
                                 f"{n}-device slice")
            self.mesh = create_mesh((n // int(tp), int(tp)))
            params = jax.tree_util.tree_map(
                jax.device_put, params, param_shardings(params, self.mesh))
        self.config = config
        self.tokenizer = tokenizer
        self.image_processor = image_processor
        eos = getattr(tokenizer, "eos_token_id", None) or 151645
        self.generator = Qwen3VLGenerator(self.model, params,
                                          eos_token_id=int(eos),
                                          kv_dtype=kv_dtype,
                                          prefill_chunk=prefill_chunk,
                                          mesh=self.mesh)
        self.spec_generator = None
        if draft_model_path is not None or draft_params is not None:
            from emr2a_tpu.models.speculative import SpeculativeGenerator
            draft_config, draft_params = _load_qwen3_vl(
                draft_model_path, draft_config, draft_params, cache_params)
            draft_model = Qwen3VLModel(draft_config)
            draft_params = _quantize_decoder(draft_params, precision,
                                             model=draft_model,
                                             tokenizer=tokenizer)
            if self.mesh is not None:
                import jax
                from emr2a_tpu.training import param_shardings
                draft_params = jax.tree_util.tree_map(
                    jax.device_put, draft_params,
                    param_shardings(draft_params, self.mesh))
            self.spec_generator = SpeculativeGenerator(
                self.model, params, draft_model,
                draft_params, spec_k=spec_k, eos_token_id=int(eos),
                kv_dtype=kv_dtype)

    # -- prompt assembly --

    def _render_chat(self, n_images: int, prompt: str,
                     system: Optional[str]) -> str:
        """Chat-template with image placeholders expanded later; uses the
        tokenizer's template when available."""
        content = [{"type": "image"}] * n_images + [
            {"type": "text", "text": prompt}]
        messages = []
        if system:
            messages.append({"role": "system", "content": system})
        messages.append({"role": "user", "content": content})
        if hasattr(self.tokenizer, "apply_chat_template"):
            try:
                return self.tokenizer.apply_chat_template(
                    messages, tokenize=False, add_generation_prompt=True)
            except Exception:
                pass
        # minimal fallback template
        sys_part = f"<|im_start|>system\n{system}<|im_end|>\n" if system else ""
        img_part = "<|vision_start|><|image_pad|><|vision_end|>" * n_images
        return (f"{sys_part}<|im_start|>user\n{img_part}{prompt}<|im_end|>\n"
                f"<|im_start|>assistant\n")

    def _expand_image_tokens(self, ids: List[int],
                             tokens_per_image: List[int]) -> List[int]:
        """Replace each single image_pad token with its per-image count."""
        out: List[int] = []
        img_i = 0
        image_token = self.config.image_token_id
        for t in ids:
            if t == image_token and img_i < len(tokens_per_image):
                out.extend([image_token] * tokens_per_image[img_i])
                img_i += 1
            else:
                out.append(t)
        return out

    def _prepare(self, images: Sequence, prompt: str,
                 system: Optional[str]):
        """Process one request to (ids, patches, grids)."""
        images = list(images)
        patches_list = []
        grids: List[Tuple[int, int, int]] = []
        tokens_per_image = []
        for img in images:
            if self.standardize_images:
                n = self.standardize_images
                from PIL import Image
                # isinstance, not hasattr("resize"): np.ndarray also
                # has .resize, which mutates in place and returns None
                if not isinstance(img, Image.Image):
                    img = Image.fromarray(np.asarray(img))
                img = img.resize((n, n))
            proc = self.image_processor(images=[np.asarray(img)],
                                        return_tensors="np")
            patches_list.append(proc["pixel_values"])
            g = tuple(int(x) for x in proc["image_grid_thw"][0])
            grids.append(g)
            merge = self.config.vision.spatial_merge_size
            tokens_per_image.append(g[0] * g[1] * g[2] // merge ** 2)

        text = self._render_chat(len(images), prompt, system)
        ids = self.tokenizer(text, add_special_tokens=False)["input_ids"]
        ids = self._expand_image_tokens(ids, tokens_per_image)
        patches = (np.concatenate(patches_list, axis=0)
                   if patches_list else None)
        return ids, patches, grids

    def _decode_row(self, row: np.ndarray) -> str:
        tokens = row.tolist()
        eos = self.generator.eos_token_id
        if eos in tokens:
            tokens = tokens[:tokens.index(eos)]
        return self.tokenizer.decode(tokens, skip_special_tokens=True)

    def generate(self, images: Sequence, prompt: str,
                 system: Optional[str] = None, max_new_tokens: int = 1024,
                 temperature: float = 0.0, top_p: float = 0.9) -> str:
        """temperature<=0 is greedy; otherwise nucleus sampling with
        ``top_p`` (the reference's do_sample/top_p semantics,
        llms/qwen3_llm.py:103-113)."""
        ids, pixel_patches, grids = self._prepare(images, prompt, system)
        input_ids = np.asarray([ids], dtype=np.int64)
        if self.spec_generator is not None:
            # greedy: lossless — same tokens as the plain greedy path,
            # fewer target weight streams per emitted token.  Sampled:
            # rejection-sampling acceptance keeps the stream distributed
            # exactly as target-only sampling (models/speculative.py).
            out_ids = self.spec_generator.generate(
                input_ids, pixel_patches=pixel_patches,
                grid_thw=tuple(grids), max_new_tokens=max_new_tokens,
                prompt_bucket=self.prompt_bucket,
                temperature=temperature,
                top_p=top_p if temperature > 0 else 1.0)
            return self._decode_row(out_ids[0])
        out_ids = self.generator.generate(
            input_ids, pixel_patches=pixel_patches, grid_thw=tuple(grids),
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p if temperature > 0 else 1.0,
            prompt_bucket=self.prompt_bucket, chunk=self.decode_chunk)
        return self._decode_row(out_ids[0])

    def generate_batch(self, requests: Sequence[dict],
                       max_new_tokens: int = 1024,
                       temperature: float = 0.0,
                       top_p: float = 0.9) -> List[str]:
        """Serve N heterogeneous requests in ONE prefill + decode.

        ``requests``: dicts with ``images`` (PIL sequence), ``prompt``
        and optional ``system``.  Rows may differ in prompt length and
        image layout: prompts are right-padded to a shared bucket with
        per-row ``true_lens``; every row's image patches/grids are
        concatenated flat in row order (the model's image-table gather
        is row-major, models/qwen3_vl.visual_gather_indices).

        Decode is weight-bandwidth-bound — the per-step weight stream
        is batch-invariant — so batching N audit cases costs ~1x decode
        wall time instead of Nx (measured: docs/PERF_NOTES.md).  The
        reference serves its audit loop strictly one case at a time
        (vlm_audit_module.py:651-734).
        """
        if not requests:
            return []
        rows = [self._prepare(r["images"], r["prompt"], r.get("system"))
                for r in requests]
        from emr2a_tpu.models.qwen3_vl import compute_mrope_position_ids
        merge = self.config.vision.spatial_merge_size
        # Per-row position ids on the unpadded row (padding later is
        # masked out, its position values are irrelevant).
        pos_rows = [
            compute_mrope_position_ids(
                np.asarray([ids], dtype=np.int64), grids,
                self.config.image_token_id, merge)
            for ids, _, grids in rows]
        true_lens = np.asarray([len(ids) for ids, _, _ in rows],
                               dtype=np.int32)
        seq = int(true_lens.max())
        B = len(rows)
        input_ids = np.zeros((B, seq), dtype=np.int64)  # 0 != image token
        position_ids = np.zeros((3, B, seq), dtype=np.int64)
        for b, (ids, _, _) in enumerate(rows):
            input_ids[b, :len(ids)] = ids
            position_ids[:, b, :len(ids)] = pos_rows[b][:, 0]
        patch_arrays = [p for _, p, _ in rows if p is not None]
        pixel_patches = (np.concatenate(patch_arrays, axis=0)
                         if patch_arrays else None)
        flat_grids = tuple(g for _, _, grids in rows for g in grids)
        out_ids = self.generator.generate(
            input_ids, pixel_patches=pixel_patches, grid_thw=flat_grids,
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p if temperature > 0 else 1.0,
            prompt_bucket=self.prompt_bucket, true_lens=true_lens,
            position_ids=position_ids, chunk=self.decode_chunk)
        return [self._decode_row(out_ids[b]) for b in range(B)]

    def generate_stream(self, requests: Sequence[dict],
                        max_new_tokens: int = 1024,
                        n_slots: int = 8, temperature: float = 0.0,
                        top_p: float = 0.9) -> List[str]:
        """Serve N heterogeneous requests through continuous batching
        (models/serving.ContinuousBatcher): ``n_slots`` requests decode
        together and any slot whose request finishes is refilled from
        the queue between chunks — unlike ``generate_batch``, a batch
        of mixed output lengths is never held hostage by its slowest
        row.  Request dicts match generate_batch's (``images``/
        ``prompt``/optional ``system``), plus optional per-request
        ``temperature``/``top_p``/``seed`` overriding the call-level
        sampling config (slots with mixed temperatures serve
        together) and an optional per-request ``max_new_tokens``
        budget (capped by the call-level value, which sizes the KV
        cache)."""
        if not requests:
            return []
        from emr2a_tpu.models.serving import ContinuousBatcher
        rows = [self._prepare(r["images"], r["prompt"], r.get("system"))
                for r in requests]
        max_len = max(len(ids) for ids, _, _ in rows)
        bucket = -(-max_len // self.prompt_bucket) * self.prompt_bucket
        # a wave with a draft loaded serves speculatively: every slot
        # advances by draft-k/verify-1 cycles — greedy slots lossless,
        # sampled slots through rejection sampling (the batcher picks
        # the acceptance rule per wave, models/serving.py)
        use_spec = self.spec_generator is not None
        key = (bucket, int(n_slots), int(max_new_tokens), use_spec)
        if not hasattr(self, "_batchers"):
            self._batchers = {}
        if key not in self._batchers:
            spec_kwargs = (dict(draft_model=self.spec_generator.dm,
                                draft_params=self.spec_generator.dp,
                                spec_k=self.spec_generator.spec_k)
                           if use_spec else {})
            self._batchers[key] = ContinuousBatcher(
                self.generator.model, self.generator.params,
                n_slots=n_slots, prompt_bucket=bucket,
                max_new_tokens=max_new_tokens,
                eos_token_id=self.generator.eos_token_id,
                kv_dtype=self.generator.kv_dtype,
                prefill_chunk=self.prefill_chunk, mesh=self.mesh,
                **spec_kwargs)
        reqs = []
        for i, (ids, patches, grids) in enumerate(rows):
            t = float(requests[i].get("temperature", temperature) or 0.0)
            reqs.append({
                "input_ids": np.asarray([ids], dtype=np.int64),
                "pixel_patches": patches, "grid_thw": tuple(grids),
                "temperature": t,
                # None-safe like temperature/seed: a request carrying
                # an explicit top_p=None falls back to the call level
                "top_p": float((requests[i].get("top_p") or top_p)
                               if t > 0 else 1.0),
                # `is not None`, not `or`: an explicit seed 0 is a seed
                "seed": int(requests[i]["seed"]
                            if requests[i].get("seed") is not None else i)})
            if requests[i].get("max_new_tokens"):
                reqs[-1]["max_new_tokens"] = min(
                    int(requests[i]["max_new_tokens"]), max_new_tokens)
        out = self._batchers[key].serve(reqs, max_new_tokens=max_new_tokens)
        return [self._decode_row(row) for row in out]
