"""Text-modality embedding throughput, real chip.

The reference protocol embeds clinical text for every patient
(/root/reference/analysis/run_cv_experiments.py:216-237) with either
the BioMedCLIP PubMedBERT-256 tower or the Qwen3-VL-8B text model;
round 2 published image-tower numbers only.  This measures texts/s for:

- PubMedBERT-256 (BioMedCLIPTextTower: BERT-base @ seq 256 + cls-pool
  + MLP proj), bf16 and W8A8 (quantize_params_tree; the masked BERT
  attention runs its projections through the streaming int8 kernel,
  models/layers._QuantRoutingModule),
- the Qwen text-embedding tap (QwenTextModel forward, mean over final
  hidden) at 2B bf16/int8 and 8B int8 geometry (8B bf16 exceeds
  single-chip HBM; see exp_qwen_generate.py).

Methodology (docs/PERF_NOTES.md): >= 100 scan-chained iterations in ONE
jit, input perturbed per step so the tower can't hoist, one scalar
readback, relay RTT subtracted.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 100


def _t(f):
    t0 = time.time()
    f()
    return time.time() - t0


def _rtt():
    @jax.jit
    def empty(x):
        return x + 1.0
    float(empty(jnp.float32(0)))
    return min(_t(lambda: float(empty(jnp.float32(i)))) for i in range(1, 4))


def measure_chain(apply_fn, params, ids, mask, rtt):
    """apply_fn(params, ids, mask) -> (B, D); returns seconds/batch."""

    @jax.jit
    def chain(params, ids, mask):
        def body(carry, i):
            # perturb one token per step so the forward can't hoist
            ids_i = ids.at[:, 1].set(2 + i % 50)
            out = apply_fn(params, ids_i, mask)
            return carry + out.astype(jnp.float32).sum(), None
        total, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(ITERS, dtype=jnp.int32))
        return total

    t0 = time.time()
    float(chain(params, ids, mask))
    print(f"  compile+run: {time.time()-t0:.1f}s", flush=True)
    dt = min(_t(lambda: float(chain(params, ids, mask))) for _ in range(3))
    return max(dt - rtt, 1e-9) / ITERS


def bench_bert(precision, seq, batch, rtt, emit):
    from emr2a_tpu.encoders.biomedclip_encoder import default_biomedclip_config
    from emr2a_tpu.models.clip import BioMedCLIPTextTower
    from emr2a_tpu.models.text import BertConfig

    base = default_biomedclip_config()
    tcfg = BertConfig(**{**base.text.__dict__, "dtype": jnp.bfloat16})
    cfg = type(base)(vision=base.vision, text=tcfg,
                     projection_dim=base.projection_dim,
                     text_proj=base.text_proj)
    tower = BioMedCLIPTextTower(cfg)
    ids0 = jnp.zeros((1, seq), jnp.int32)
    params = jax.jit(lambda k: tower.init(k, ids0, jnp.ones_like(ids0))
                     ["params"])(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    if precision == "int8":
        from emr2a_tpu.models.quantize import quantize_params_tree
        params = quantize_params_tree(jax.device_get(params))
    params = jax.device_put(params)
    jax.block_until_ready(params)

    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(2, 30000, (batch, seq)), jnp.int32)
    mask = jnp.ones((batch, seq), jnp.int32)
    per_batch = measure_chain(
        lambda p, i, m: tower.apply({"params": p}, i, m), params, ids,
        mask, rtt)
    rate = batch / per_batch
    print(f"PubMedBERT-{seq} {precision}: {per_batch*1e3:.2f} ms/batch{batch}"
          f" = {rate:.0f} texts/s")
    emit(f"pubmedbert{seq}_embed", rate, "texts/s", precision)


def bench_qwen(geometry, precision, seq, batch, rtt, emit):
    from exp_qwen_generate import build_config, materialize_quantized_on_device
    from emr2a_tpu.models.qwen3_vl import Qwen3VLModel

    cfg = build_config(geometry)
    model = Qwen3VLModel(cfg)
    if precision == "int8":
        params = materialize_quantized_on_device(model, jax.random.PRNGKey(0))
    else:
        ids1 = jnp.zeros((1, 1), jnp.int32)
        pos1 = jnp.zeros((3, 1, 1), jnp.int32)
        params = jax.jit(lambda k: model.init(k, ids1, pos1)["params"])(
            jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    pos = jnp.broadcast_to(jnp.arange(seq, dtype=jnp.int32)[None, None, :],
                           (3, batch, seq))

    def text_embed(p, ids, _mask):
        hidden, _ = model.apply({"params": p}, ids, pos, return_hidden=True)
        return hidden.mean(axis=1)

    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(2, 150000, (batch, seq)), jnp.int32)
    per_batch = measure_chain(text_embed, params, ids, None, rtt)
    rate = batch / per_batch
    print(f"Qwen text-embed {geometry} {precision} seq{seq}: "
          f"{per_batch*1e3:.2f} ms/batch{batch} = {rate:.1f} texts/s")
    emit(f"qwen_text_embed_{geometry}", rate, "texts/s", precision)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="bert",
                    help="comma list: bert,qwen2b,qwen8b")
    ap.add_argument("--precision", default="bf16,int8")
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--qwen_batch", type=int, default=16)
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()
    what = set(args.what.split(","))
    precisions = args.precision.split(",")

    records = []

    def emit(metric, value, unit, precision):
        rec = {"metric": metric, "value": round(float(value), 1),
               "unit": unit, "precision": precision}
        records.append(rec)
        print(json.dumps(rec), flush=True)
        if args.json_out:  # flush per metric
            with open(args.json_out, "a", encoding="utf-8") as f:
                f.write(json.dumps(rec) + "\n")

    rtt = _rtt()
    if "bert" in what:
        for prec in precisions:
            bench_bert(prec, args.seq, args.batch, rtt, emit)
    if "qwen2b" in what:
        for prec in precisions:
            bench_qwen("2b", prec, args.seq, args.qwen_batch, rtt, emit)
    if "qwen8b" in what:
        bench_qwen("8b", "int8", args.seq, args.qwen_batch, rtt, emit)


if __name__ == "__main__":
    main()
