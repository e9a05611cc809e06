"""Judge-path generation benchmark at Qwen3-VL 2B/8B shapes, real chip.

The reference's flagship judge is Qwen3-VL-**8B**-thinking
(/root/reference/encoders/qwen3_vl_8b_thinking_encoder.py:30-43,
pipelines/step4_vlm_review/vlm_audit_module.py:69-91); its audit hot
loop is VLM generation (vlm_audit_module.py:249-364).  This measures,
with random-init weights (perf is weight-agnostic):

- vision tower forward for one 448x448 image,
- prefill latency at the 1024-token prompt bucket,
- decode tokens/s (isolated as (t(max_new=96) - t(max_new=32)) / 64),
- peak HBM in use (``--geometry 8b``).

``--geometry 8b`` = Qwen3-8B text geometry (hidden 4096, 36 layers,
GQA 32:8, head 128, ffn 12288, untied lm_head).  bf16 8B params are
16.1 GB — at/over a v5e's 16 GB HBM before KV cache — so the 8B
single-chip serving mode is W8A8 (~9.4 GB: int8 decoder linears + bf16
embed/lm_head); the quantized tree is materialized directly on device
(an intermediate bf16 tree would OOM).  bf16 8B serving = TP over a
mesh (training/sharding_rules.py; rehearsed in
__graft_entry__.dryrun_multichip).

The whole prefill+decode runs as ONE jitted call (Qwen3VLGenerator),
so the ~30 ms relay RTT is subtracted once per measurement.  Appends a
bench-style JSON line per metric with --json_out.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _t(f):
    t0 = time.time()
    f()
    return time.time() - t0


_QWEN_PROJS = ("q_proj", "k_proj", "v_proj", "o_proj",
               "gate_proj", "up_proj", "down_proj")


def materialize_quantized_on_device(model, key, lm_head_int8=True,
                                    precision="int8", fuse_projs=False,
                                    vision_grid=None):
    """Random-init a text model's params directly in the quantized
    serving layout (``precision="int8"``: kernel_q int8 + kernel_scale
    f32; ``"int4"``: kernel_p4 packed nibbles + group-128 kernel_scale4
    — ops/linear_int4) for every layer_i projection, bf16 elsewhere,
    leaf by leaf ON device.

    Never materializes the bf16 tree — at 8B geometry that alone is
    16.1 GB and OOMs a v5e before quantization could run.  Perf is
    weight-agnostic, so random quantized weights measure exactly what
    converted real weights would.
    """
    if vision_grid is not None:
        # include the vision tower in the param tree (multimodal
        # serving benches): shapes only — eval_shape never runs the
        # tower
        t, h, w = vision_grid
        cfgv = model.config.vision
        n_tok = t * h * w // cfgv.spatial_merge_size ** 2
        ids1 = jnp.concatenate([
            jnp.zeros((1, 2), jnp.int32),
            jnp.full((1, n_tok), model.config.image_token_id, jnp.int32),
            jnp.zeros((1, 2), jnp.int32)], axis=1)
        pos1 = jnp.zeros((3, 1, ids1.shape[1]), jnp.int32)
        patches1 = jax.ShapeDtypeStruct((t * h * w, cfgv.patch_dim),
                                        cfgv.dtype)
        shapes = jax.eval_shape(
            lambda k, p: model.init(k, ids1, pos1, pixel_patches=p,
                                    grid_thw=(vision_grid,))["params"],
            key, patches1)
    else:
        ids1 = jnp.zeros((1, 1), jnp.int32)
        pos1 = jnp.zeros((3, 1, 1), jnp.int32)
        shapes = jax.eval_shape(
            lambda k: model.init(k, ids1, pos1)["params"], key)

    # float leaves land bf16 (converted real checkpoints store bf16 —
    # an f32 embed/lm_head would stream 2x the bytes every decode step
    # and misrepresent serving perf)
    make_f = jax.jit(lambda k, s=None, d=None: (jax.random.normal(k, s)
                                                * 0.02).astype(
                         jnp.bfloat16 if d == jnp.float32 else d),
                     static_argnames=("s", "d"))
    make_q = jax.jit(lambda k, s=None: jax.random.randint(
        k, s, -16, 17, jnp.int8), static_argnames=("s",))

    counter = [0]

    def fresh():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    def quant_entry(sub, int4):
        K, N = tuple(sub["kernel"].shape)
        if int4:
            entry = {
                "kernel_p4": make_q(fresh(), s=(K // 2, N)),
                "kernel_scale4": jnp.full((K // 128, N), 5e-4,
                                          jnp.float32),
            }
        else:
            entry = {
                "kernel_q": make_q(fresh(), s=(K, N)),
                "kernel_scale": jnp.full((N,), 5e-4, jnp.float32),
            }
        if "bias" in sub:
            entry["bias"] = make_f(fresh(), s=tuple(sub["bias"].shape),
                                   d=sub["bias"].dtype)
        return entry

    _FUSES = {"qkv_proj": ("q_proj", "k_proj", "v_proj"),
              "gate_up_proj": ("gate_proj", "up_proj")}

    def walk(tree, in_layer):
        out = {}
        fused_away = set()
        if in_layer and fuse_projs:
            for fname, parts in _FUSES.items():
                if all(p in tree and "kernel" in tree[p] for p in parts):
                    K = tree[parts[0]]["kernel"].shape[0]
                    N = sum(tree[p]["kernel"].shape[1] for p in parts)
                    out[fname] = quant_entry(
                        {"kernel": jax.ShapeDtypeStruct((K, N),
                                                        jnp.float32)},
                        precision == "int4")
                    fused_away.update(parts)
        for name, sub in tree.items():
            if name in fused_away:
                continue
            layerish = in_layer or name.startswith("layer_")
            if isinstance(sub, dict):
                if name == "lm_head" and lm_head_int8 and "kernel" in sub:
                    out[name] = quant_entry(sub, False)
                elif (in_layer and name in _QWEN_PROJS
                      and "kernel" in sub):
                    out[name] = quant_entry(sub, precision == "int4")
                else:
                    out[name] = walk(sub, layerish)
            else:
                out[name] = make_f(fresh(), s=tuple(sub.shape),
                                   d=sub.dtype)
        return out

    return walk(shapes, False)


def build_config(geometry: str, layers=None):
    from emr2a_tpu.models.qwen3_vl import (Qwen3VLConfig, QwenTextConfig,
                                           QwenVisionConfig)
    if geometry == "tiny":
        # CPU harness smoke only — keeps every script driveable
        # without a multi-minute hidden-4096 compile.
        text = QwenTextConfig(
            vocab_size=512, hidden_size=64, num_layers=layers or 2,
            num_heads=4, num_kv_heads=2, head_dim=16,
            intermediate_size=128, mrope_section=(4, 2, 2),
            dtype=jnp.bfloat16)
        vis = QwenVisionConfig(
            depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
            patch_size=4, out_hidden_size=64, num_position_embeddings=64,
            deepstack_visual_indexes=(0,), dtype=jnp.bfloat16)
    elif geometry == "2b":
        # Qwen3-VL-2B-class (hidden 2048 / 28 layers / GQA 16:8 /
        # head_dim 128 / ffn 6144; vision: depth 24, hidden 1152).
        text = QwenTextConfig(
            vocab_size=151936, hidden_size=2048,
            num_layers=layers or 28, num_heads=16, num_kv_heads=8,
            head_dim=128, intermediate_size=6144,
            mrope_section=(24, 20, 20), dtype=jnp.bfloat16)
        vis = QwenVisionConfig(
            depth=24, hidden_size=1152, intermediate_size=4304,
            num_heads=16, patch_size=16, temporal_patch_size=2,
            spatial_merge_size=2, out_hidden_size=2048,
            num_position_embeddings=2304,
            deepstack_visual_indexes=(5, 11, 17), dtype=jnp.bfloat16)
    else:
        # Qwen3-VL-8B (Qwen3-8B text: hidden 4096 / 36 layers /
        # GQA 32:8 / head 128 / ffn 12288 / untied lm_head; vision:
        # depth 27, out_hidden 4096) — the reference's flagship judge,
        # /root/reference/encoders/qwen3_vl_8b_thinking_encoder.py:30-43.
        text = QwenTextConfig(
            vocab_size=151936, hidden_size=4096,
            num_layers=layers or 36, num_heads=32, num_kv_heads=8,
            head_dim=128, intermediate_size=12288,
            mrope_section=(24, 20, 20), tie_word_embeddings=False,
            dtype=jnp.bfloat16)
        vis = QwenVisionConfig(
            depth=27, hidden_size=1152, intermediate_size=4304,
            num_heads=16, patch_size=16, temporal_patch_size=2,
            spatial_merge_size=2, out_hidden_size=4096,
            num_position_embeddings=2304,
            deepstack_visual_indexes=(8, 16, 24), dtype=jnp.bfloat16)
    return Qwen3VLConfig(vision=vis, text=text)


def main():
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--what", default="all", help="comma list: text,vision")
    ap.add_argument("--precision", default="bf16",
                    choices=["bf16", "int8", "int4"])
    ap.add_argument("--geometry", default="2b",
                choices=["tiny", "2b", "8b"])
    ap.add_argument("--json_out", default=None,
                    help="append one JSON line per metric here")
    ap.add_argument("--lm_head", default="bf16", choices=["int8", "bf16"],
                    help="8B lm_head precision (bf16 default: int8 "
                         "trades -24ms prefill for +1.5ms/token decode)")
    ap.add_argument("--fuse", action="store_true",
                    help="fuse q/k/v and gate/up projections "
                         "(quantize_qwen_text_params fuse_projs)")
    ap.add_argument("--hbm_probe", action="store_true",
                    help="binary-search ballast to bound peak HBM "
                         "(memory_stats is empty through the relay)")
    ap.add_argument("--kv", default="bf16", choices=["bf16", "int8"],
                    help="KV-cache precision (int8 halves KV "
                         "residency/stream; scales folded into the "
                         "attention math)")
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="decode sampling temperature (0 = greedy); "
                         ">0 measures the top-k=50/top-p sampler's "
                         "per-step cost at the real 151,936 vocab")
    ap.add_argument("--batch", type=int, default=1,
                    help="audit cases served per prefill+decode "
                         "(heterogeneous prompt lengths, per-row "
                         "true_lens — the generate_batch serving path)")
    ap.add_argument("--prompt_len", type=int, default=None,
                    help="real token count per prompt row (default: 24 "
                         "tiny / 980 otherwise)")
    ap.add_argument("--bucket", type=int, default=None,
                    help="prompt bucket (default: 32 tiny / 1024 "
                         "otherwise); long buckets need "
                         "--prefill_chunk")
    ap.add_argument("--prefill_chunk", type=int, default=None,
                    help="sequence-chunked prefill: scan the prompt "
                         "through the decoder in this many tokens per "
                         "step, bounding the (B, heads, S, L) f32 "
                         "attention temps that OOM B>=16 or long "
                         "buckets")
    args = ap.parse_args()
    what = set(args.what.split(","))
    if args.geometry == "8b" and args.precision == "bf16":
        ap.error("8B bf16 params (16.1 GB) exceed single-chip HBM; "
                 "use --precision int8/int4 (single chip) or the TP "
                 "path (dryrun_multichip)")

    records = []
    # the chunk the generator actually runs with — the generate block
    # overwrites this with the auto-resolved value when no flag is set
    effective_chunk = {"v": args.prefill_chunk}

    def emit(metric, value, unit):
        rec = {"metric": metric, "value": round(float(value), 3),
               "unit": unit, "geometry": args.geometry,
               "precision": args.precision}
        if args.fuse:
            rec["fused_projs"] = True
        if args.batch > 1:
            rec["batch"] = args.batch
        if args.temperature > 0:
            rec["temperature"] = args.temperature
        if args.kv != "bf16":
            rec["kv"] = args.kv
        ec = effective_chunk["v"]
        if isinstance(ec, dict):  # auto-resolved per max_new cache length
            ec = {str(k): v for k, v in ec.items() if v} or None
        if ec:
            rec["prefill_chunk"] = ec
            if args.prefill_chunk is None:
                rec["prefill_chunk_auto"] = True
        records.append(rec)
        print(json.dumps(rec), flush=True)
        if args.json_out:  # flush per metric — a later crash (e.g. the
            # deliberately-OOMing HBM probe) must not lose earlier rows
            with open(args.json_out, "a", encoding="utf-8") as f:
                f.write(json.dumps(rec) + "\n")

    from emr2a_tpu.models.qwen3_vl import (
        Qwen3VLGenerator, Qwen3VLModel, QwenVisionTower,
        compute_mrope_position_ids)

    cfg = build_config(args.geometry, args.layers)

    rtt = None

    def measure(fn, n=3):
        nonlocal rtt
        if rtt is None:
            @jax.jit
            def empty(x):
                return x + 1.0
            float(empty(jnp.float32(0)))
            rtt = min(_t(lambda: float(empty(jnp.float32(i))))
                      for i in range(1, 4))
        return min(_t(fn) for _ in range(n)) - rtt

    if {"text", "all"} & what:
        model = Qwen3VLModel(cfg)
        print(f"init {args.geometry} text params on device "
              f"({args.precision})...", flush=True)
        if args.geometry == "8b":
            # quantized layout materialized directly on device — no
            # intermediate bf16 tree (it would OOM the chip)
            params = materialize_quantized_on_device(
                model, jax.random.PRNGKey(0),
                lm_head_int8=args.lm_head == "int8",
                precision=args.precision, fuse_projs=args.fuse)
        else:
            ids1 = jnp.zeros((1, 1), jnp.int32)
            pos1 = jnp.zeros((3, 1, 1), jnp.int32)
            params = jax.jit(lambda k: jax.tree_util.tree_map(
                lambda x: (x.astype(jnp.bfloat16)
                           if x.dtype == jnp.float32 else x),
                model.init(k, ids1, pos1)["params"]))(jax.random.PRNGKey(0))
            if args.precision in ("int8", "int4"):
                from emr2a_tpu.models.quantize import (
                    quantize_qwen_text_params)
                params = {**params, "language_model":
                          quantize_qwen_text_params(
                              params["language_model"],
                              precision=args.precision,
                              fuse_projs=args.fuse)}
                params = jax.device_put(params)
        jax.block_until_ready(params)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        n_bytes = sum(x.size * x.dtype.itemsize
                      for x in jax.tree_util.tree_leaves(params))
        print(f"params: {n_params/1e9:.2f}B ({n_bytes/2**30:.2f} GiB "
              "on device)", flush=True)

        gen = Qwen3VLGenerator(model, params, eos_token_id=-1,  # never stop
                               kv_dtype=args.kv,
                               prefill_chunk=args.prefill_chunk)
        rng = np.random.RandomState(0)
        B = args.batch
        vocab_hi = cfg.text.vocab_size - 2
        plen = args.prompt_len or (24 if args.geometry == "tiny" else 980)
        prompt = rng.randint(2, vocab_hi, (B, plen), np.int64)
        # a random id can land on the image placeholder, which demands
        # matching grid_thw entries — remap it (hit once at B=32 x 980)
        prompt[prompt == cfg.image_token_id] = 2
        # heterogeneous rows: the batched audit path pads shorter
        # prompts to the shared bucket with per-row true_lens
        true_lens = (None if B == 1 else
                     np.asarray([plen - (plen // 16) * (b % 4)
                                 for b in range(B)], np.int32))

        bucket = args.bucket or (32 if args.geometry == "tiny" else 1024)
        if args.prefill_chunk is None:
            from emr2a_tpu.models.qwen3_vl import auto_prefill_chunk
            # Resolve the auto chunk with the SAME max_len the generator
            # will use per max_new (it re-resolves per compiled cache
            # length, so near the budget threshold the two runs can pick
            # different chunks); record both.
            effective_chunk["v"] = {
                mn: auto_prefill_chunk(B, cfg.text.num_heads, bucket,
                                       bucket + mn)
                for mn in ((8, 24) if args.geometry == "tiny" else (32, 96))}
            if any(effective_chunk["v"].values()):
                print(f"auto prefill_chunk per max_new: "
                      f"{effective_chunk['v']}", flush=True)
        times = {}
        for max_new in ((8, 24) if args.geometry == "tiny" else (32, 96)):
            t0 = time.time()
            gen.generate(prompt, max_new_tokens=max_new, prompt_bucket=bucket,
                         true_lens=true_lens, temperature=args.temperature,
                         top_p=0.9 if args.temperature > 0 else 1.0)
            print(f"compile+run max_new={max_new}: {time.time()-t0:.1f}s",
                  flush=True)
            times[max_new] = measure(
                lambda mn=max_new: gen.generate(
                    prompt, max_new_tokens=mn, prompt_bucket=bucket,
                    true_lens=true_lens, temperature=args.temperature,
                    top_p=0.9 if args.temperature > 0 else 1.0))
        lo, hi = (8, 24) if args.geometry == "tiny" else (32, 96)
        per_tok = (times[hi] - times[lo]) / (hi - lo)
        prefill = times[lo] - lo * per_tok
        print(f"prefill @ bucket {bucket} ({plen} real tokens, B={B}): "
              f"{prefill*1000:.1f} ms")
        print(f"decode: {per_tok*1000:.2f} ms/step = {1/per_tok:.1f} steps/s"
              f" = {B/per_tok:.1f} tok/s aggregate")
        # decode streams every linear/lm_head byte once per token; the
        # token-embedding table is a gather, not a stream, so it is
        # excluded from the bandwidth denominator
        embed_bytes = sum(
            x.size * x.dtype.itemsize
            for path, x in jax.tree_util.tree_leaves_with_path(params)
            if "embed_tokens" in jax.tree_util.keystr(path))
        bw = (n_bytes - embed_bytes) / per_tok / 1e9
        print(f"decode weight-bandwidth: {bw:.0f} GB/s "
              f"(excl. {embed_bytes/2**30:.2f} GiB embed table; chip "
              "stream rate 853)")
        emit(f"judge_prefill_{bucket}", prefill * 1000, "ms")
        emit("judge_decode", B / per_tok, "tok/s")  # aggregate over batch
        emit("judge_decode_weight_bw", bw, "GB/s")
        emit("judge_params_resident", n_bytes / 2**30, "GiB")
        stats = {}
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
        except Exception:
            pass
        if stats.get("peak_bytes_in_use"):
            peak = stats["peak_bytes_in_use"]
            print(f"peak HBM in use: {peak/2**30:.2f} GiB")
            emit("judge_peak_hbm", peak / 2**30, "GiB")
        elif args.hbm_probe:
            # memory_stats is empty through the relay: measure peak
            # indirectly as (16 GiB - largest ballast that can coexist
            # with the serving run), 256 MiB resolution.
            make_ballast = jax.jit(
                lambda n: jnp.zeros((n, 2**20), jnp.uint8),
                static_argnums=0)
            step, lo = 512, 0
            limit = int((16 * 2**30 - n_bytes) // 2**20)
            for mib in range(step, limit + 1, step):
                ballast = None
                try:
                    ballast = make_ballast(mib)
                    jax.block_until_ready(ballast)
                    gen.generate(prompt, max_new_tokens=32,
                                 prompt_bucket=1024)
                    lo = mib
                    print(f"  ballast {mib} MiB OK", flush=True)
                except Exception as e:
                    print(f"  ballast {mib} MiB failed "
                          f"({type(e).__name__})", flush=True)
                    ballast = None
                    # confirm the failure was capacity, not a poisoned
                    # runtime: a ballast-free run must still succeed
                    gen.generate(prompt, max_new_tokens=32,
                                 prompt_bucket=1024)
                    break
                finally:
                    del ballast
            peak = 16 * 2**30 - lo * 2**20
            print(f"peak HBM (16 GiB - {lo} MiB ballast headroom): "
                  f"<= {peak/2**30:.2f} GiB (+-{step} MiB)")
            emit("judge_peak_hbm_ballast", peak / 2**30, "GiB")

    if {"vision", "all"} & what:
        tower = QwenVisionTower(cfg.vision)
        grid = ((1, 28, 28),)  # 448x448 -> 784 patches -> 196 merged tokens
        patches = jnp.asarray(
            np.random.RandomState(0).randn(784, cfg.vision.patch_dim),
            jnp.bfloat16)
        vparams = jax.jit(lambda k: tower.init(k, patches, grid))(
            jax.random.PRNGKey(1))["params"]
        jax.block_until_ready(vparams)

        @jax.jit
        def vfwd(p, x):
            out, _, _ = tower.apply({"params": p}, x, grid)
            return out.astype(jnp.float32).sum()

        float(vfwd(vparams, patches))
        dt = measure(lambda: float(vfwd(vparams, patches)))
        print(f"vision tower fwd 448x448 ({cfg.vision.depth} layers): "
              f"{dt*1000:.1f} ms")
        emit("judge_vision_fwd_448", dt * 1000, "ms")

if __name__ == "__main__":
    main()
