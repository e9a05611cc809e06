"""Per-stage timing breakdown of the BioMedCLIP embed path at bench
shapes, on the real chip.

Methodology (CLAUDE.md): chain iterations inside one jit via lax.scan,
perturb the carried input by +c*1e-9 so nothing hoists, read back one
scalar, subtract empty-jit RTT, divide by iteration count.
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

RTT_CACHE = {}


def timed_chain(fn, x0, iters, tag=""):
    """fn: x -> x-like; returns per-iteration ms."""

    @jax.jit
    def chain(x):
        def body(carry, c):
            return fn(carry, c), None
        out, _ = jax.lax.scan(body, x0, jnp.arange(iters, dtype=jnp.float32))
        return jax.tree_util.tree_reduce(
            lambda a, b: a + b.astype(jnp.float32).sum(), out, jnp.float32(0))

    float(chain(x0))  # compile
    dt = min(_t(lambda: float(chain(x0))) for _ in range(3))
    rtt = _rtt()
    ms = (dt - rtt) * 1000 / iters
    print(f"{tag:42s} {ms:8.3f} ms/iter")
    return ms


def _t(f):
    t0 = time.time()
    f()
    return time.time() - t0


def _rtt():
    if "rtt" not in RTT_CACHE:
        @jax.jit
        def empty(x):
            return x + 1.0
        float(empty(jnp.float32(0)))
        RTT_CACHE["rtt"] = min(_t(lambda: float(empty(jnp.float32(i))))
                               for i in range(1, 4))
    return RTT_CACHE["rtt"]


def build_tower(batch):
    from emr2a_tpu.encoders.biomedclip_encoder import default_biomedclip_config
    from emr2a_tpu.models.clip import BioMedCLIPImageTower
    from emr2a_tpu.models.vit import ViTConfig

    base = default_biomedclip_config()
    vcfg = ViTConfig(**{**base.vision.__dict__, "dtype": jnp.bfloat16,
                        "fused_mlp": True, "fused_attn": True})
    config = type(base)(vision=vcfg, text=base.text,
                        projection_dim=base.projection_dim,
                        text_proj=base.text_proj)
    tower = BioMedCLIPImageTower(config)
    params = tower.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 3), jnp.float32))["params"]
    params = jax.device_put(jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params))
    return tower, params, config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--what", default="all",
                    help="comma list: full,attn,mlp,rest,batches")
    ap.add_argument("--batches", default="128,160,192,256",
                    help="batch sizes for --what batches")
    ap.add_argument("--tile", type=int, default=256, help="mlp tile (tune mode)")
    ap.add_argument("--head_group", type=int, default=6)
    ap.add_argument("--block_b", type=int, default=4)
    ap.add_argument("--merge_batch", action="store_true")
    ap.add_argument("--activation", default="gelu")
    ap.add_argument("--act_bf16", action="store_true")
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args()
    what = set(args.what.split(","))

    B, S, d, H, m, L = args.batch, 197, 768, 12, 3072, 12
    rng = np.random.RandomState(0)

    if {"full", "rest", "all"} & what:
        tower, params, config = build_tower(B)
        from emr2a_tpu.ops.preprocess import (BIOMEDCLIP_PREPROCESS,
                                              preprocess_images)

    if {"full", "all"} & what:
        imgs = jax.device_put(jnp.asarray(
            rng.randint(0, 256, (B, 224, 224, 3), np.uint8)))

        def full(carry, c):
            px = preprocess_images(imgs, BIOMEDCLIP_PREPROCESS)
            px = px + carry[0, 0, 0, 0] * 1e-9
            f = tower.apply({"params": params}, px.astype(jnp.bfloat16))
            f = f.astype(jnp.float32)
            f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-12)
            return carry + f.sum() * 1e-9, None

        @jax.jit
        def chain(x0):
            out, _ = jax.lax.scan(lambda c, i: full(c, i), x0,
                                  jnp.arange(args.iters))
            return out.sum()
        x0 = jnp.zeros((1, 1, 1, 1), jnp.float32)
        float(chain(x0))
        dt = min(_t(lambda: float(chain(x0))) for _ in range(3)) - _rtt()
        ms = dt * 1000 / args.iters
        print(f"{'full tower (batch %d)' % B:42s} {ms:8.3f} ms/iter "
              f"= {B * args.iters / dt:8.1f} slices/s")

    if {"attn", "all"} & what:
        from emr2a_tpu.ops.attention_block import fused_ln_attention
        x = jnp.asarray(rng.randn(B, S, d) * 0.5, jnp.bfloat16)
        mk = lambda *sh: jnp.asarray(rng.randn(*sh) * 0.02, jnp.bfloat16)
        wq, wk, wv, wo = mk(d, d), mk(d, d), mk(d, d), mk(d, d)
        bq, bk, bv, bo = mk(d), mk(d), mk(d), mk(d)
        s = jnp.asarray(rng.rand(d) * 0.1 + 1, jnp.bfloat16)
        b = mk(d)

        def attn_iter(carry, c):
            y = fused_ln_attention(carry + (c * 1e-9).astype(carry.dtype), s, b, wq, bq, wk, bk,
                                   wv, bv, wo, bo, num_heads=H,
                                   head_group=6, block_b=4)
            return y * jnp.bfloat16(0.5)  # keep magnitudes bounded

        ms = timed_chain(attn_iter, x, args.iters, "fused_ln_attention/layer")

    if {"mlp", "all"} & what:
        from emr2a_tpu.ops.mlp import fused_ln_mlp
        T = B * S
        x2 = jnp.asarray(rng.randn(T, d) * 0.5, jnp.bfloat16)
        mk = lambda *sh: jnp.asarray(rng.randn(*sh) * 0.02, jnp.bfloat16)
        w1, b1, w2, b2 = mk(d, m), mk(m), mk(m, d), mk(d)
        s2 = jnp.asarray(rng.rand(d) * 0.1 + 1, jnp.bfloat16)
        bb2 = mk(d)

        def mlp_iter(carry, c):
            y = fused_ln_mlp(carry + (c * 1e-9).astype(carry.dtype), s2, bb2, w1, b1, w2, b2,
                             activation="gelu", tile=256)
            return y * jnp.bfloat16(0.5)

        timed_chain(mlp_iter, x2, args.iters, f"fused_ln_mlp/layer (T={T})")

    if {"int8block"} & what or ({"tune"} & what and args.int8):
        # W8A8 composed block at bench shapes
        from emr2a_tpu.ops.attention_block import fused_ln_attention_int8
        from emr2a_tpu.ops.mlp import fused_ln_mlp_int8, quantize_weight_int8

        x = jnp.asarray(rng.randn(B, 200, d) * 0.5, jnp.bfloat16)
        mkf = lambda *sh: rng.randn(*sh).astype(np.float32) * 0.02
        qw = [quantize_weight_int8(mkf(d, d)) for _ in range(4)]
        qdev = [(jnp.asarray(q), jnp.asarray(sc)) for q, sc in qw]
        biases = [jnp.asarray(mkf(d), jnp.bfloat16) for _ in range(4)]
        s1 = jnp.asarray(rng.rand(d) * 0.1 + 1, jnp.bfloat16)
        b1v = jnp.asarray(mkf(d), jnp.bfloat16)
        q1, sc1 = (jnp.asarray(a) for a in quantize_weight_int8(mkf(d, m)))
        q2, sc2 = (jnp.asarray(a) for a in quantize_weight_int8(mkf(m, d)))
        bb1 = jnp.asarray(mkf(m), jnp.bfloat16)
        bb2 = jnp.asarray(mkf(d), jnp.bfloat16)
        s2 = jnp.asarray(rng.rand(d) * 0.1 + 1, jnp.bfloat16)
        b2v = jnp.asarray(mkf(d), jnp.bfloat16)

        def block_iter8(carry, c):
            y = fused_ln_attention_int8(
                carry + (c * 1e-9).astype(carry.dtype), s1, b1v,
                qdev[0][0], qdev[0][1], biases[0],
                qdev[1][0], qdev[1][1], biases[1],
                qdev[2][0], qdev[2][1], biases[2],
                qdev[3][0], qdev[3][1], biases[3],
                num_heads=H, head_group=args.head_group,
                block_b=args.block_b, valid_len=197)
            y2 = fused_ln_mlp_int8(y.reshape(B * 200, d), s2, b2v,
                                   q1, sc1, bb1, q2, sc2, bb2,
                                   act_dtype=jnp.bfloat16 if args.act_bf16
                                   else jnp.float32,
                                   tile=args.tile).reshape(B, 200, d)
            return y2 * jnp.bfloat16(0.5)

        timed_chain(block_iter8, x, args.iters,
                    f"int8 block bb={args.block_b} hg={args.head_group} "
                    f"tile={args.tile}"
                    f"{' act=bf16' if args.act_bf16 else ''}")

    if {"tune"} & what and not args.int8:
        # One composed block with explicit kernel parameters (bypasses
        # the picker) — for (block_b, head_group, mlp tile) sweeps.
        from emr2a_tpu.ops.attention_block import fused_ln_attention
        from emr2a_tpu.ops.mlp import fused_ln_mlp

        x = jnp.asarray(rng.randn(B, 200, d) * 0.5, jnp.bfloat16)
        mk = lambda *sh: jnp.asarray(rng.randn(*sh) * 0.02, jnp.bfloat16)
        wq, wk, wv, wo = mk(d, d), mk(d, d), mk(d, d), mk(d, d)
        bq, bk, bv, bo = mk(d), mk(d), mk(d), mk(d)
        s1 = jnp.asarray(rng.rand(d) * 0.1 + 1, jnp.bfloat16)
        b1v = mk(d)
        w1, bb1, w2, bb2 = mk(d, m), mk(m), mk(m, d), mk(d)
        s2 = jnp.asarray(rng.rand(d) * 0.1 + 1, jnp.bfloat16)
        b2v = mk(d)

        def block_iter(carry, c):
            y = fused_ln_attention(
                carry + (c * 1e-9).astype(carry.dtype), s1, b1v,
                wq, bq, wk, bk, wv, bv, wo, bo, num_heads=H,
                head_group=args.head_group, block_b=args.block_b,
                valid_len=197, merge_batch=args.merge_batch)
            y2 = fused_ln_mlp(y.reshape(B * 200, d), s2, b2v,
                              w1, bb1, w2, bb2, activation=args.activation,
                              act_dtype=jnp.bfloat16 if args.act_bf16
                              else jnp.float32,
                              tile=args.tile).reshape(B, 200, d)
            return y2 * jnp.bfloat16(0.5)

        timed_chain(block_iter, x, args.iters,
                    f"block bb={args.block_b} hg={args.head_group} "
                    f"tile={args.tile} merge={args.merge_batch} "
                    f"act={args.activation}{'/bf16' if args.act_bf16 else ''}")

    if {"nlayers"} & what:
        # Compose N real TransformerBlocks (the tower's exact layer
        # stack, no stem) and chain it: localizes the full-vs-isolated
        # per-layer gap.
        from emr2a_tpu.models.layers import TransformerBlock
        from flax import linen as nn

        for n_layers in (1, 2, 4, 12):
            class Stack(nn.Module):
                n: int
                @nn.compact
                def __call__(self, x):
                    for i in range(self.n):
                        x = TransformerBlock(
                            num_heads=H, mlp_dim=m, activation="gelu",
                            ln_eps=1e-6, dtype=jnp.bfloat16,
                            fused_mlp=True, fused_attn=True,
                            valid_len=197, name=f"b{i}")(x)
                    return x
            stack = Stack(n=n_layers)
            x = jnp.asarray(rng.randn(B, 200, d) * 0.5, jnp.bfloat16)
            sparams = jax.device_put(jax.tree_util.tree_map(
                lambda v: v.astype(jnp.bfloat16),
                stack.init(jax.random.PRNGKey(0), x[:1])["params"]))

            def stack_iter(carry, c):
                y = stack.apply({"params": sparams},
                                carry + (c * 1e-9).astype(carry.dtype))
                return y * jnp.bfloat16(0.5)

            ms = timed_chain(stack_iter, x, args.iters,
                            f"{n_layers}-layer stack")
            print(f"{'':42s} {ms / n_layers:8.3f} ms/layer")

    if {"stem"} & what:
        # stem+pool only: a 0-layer tower isolates everything the
        # transformer layers are NOT (preprocess, patchify, pos-embed,
        # pre-LN, final LN, cls pool, projection, L2)
        import dataclasses

        from emr2a_tpu.encoders.biomedclip_encoder import default_biomedclip_config
        from emr2a_tpu.models.clip import BioMedCLIPImageTower
        from emr2a_tpu.models.vit import ViTConfig
        from emr2a_tpu.ops.preprocess import (BIOMEDCLIP_PREPROCESS,
                                              preprocess_images)

        base = default_biomedclip_config()
        vcfg = ViTConfig(**{**base.vision.__dict__, "dtype": jnp.bfloat16,
                            "num_layers": 0,
                            "fused_mlp": True, "fused_attn": True})
        config = type(base)(vision=vcfg, text=base.text,
                            projection_dim=base.projection_dim,
                            text_proj=base.text_proj)
        tower0 = BioMedCLIPImageTower(config)
        params0 = tower0.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 224, 224, 3), jnp.float32))["params"]
        params0 = jax.device_put(jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params0))
        imgs = jax.device_put(jnp.asarray(
            rng.randint(0, 256, (B, 224, 224, 3), np.uint8)))

        def stem_iter(carry, c):
            im = imgs.at[0, 0, 0, 0].set(c.astype(jnp.uint8))
            px = preprocess_images(im, BIOMEDCLIP_PREPROCESS)
            f = tower0.apply({"params": params0}, px.astype(jnp.bfloat16))
            f = f.astype(jnp.float32)
            f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-12)
            return carry + f.sum() * 1e-9, None

        @jax.jit
        def chain0(x0):
            out, _ = jax.lax.scan(stem_iter, x0, jnp.arange(args.iters, dtype=jnp.float32))
            return out
        x0 = jnp.float32(0)
        float(chain0(x0))
        dt = min(_t(lambda: float(chain0(x0))) for _ in range(3)) - _rtt()
        print(f"{'stem+pool (0-layer tower, batch %d)' % B:42s} {dt*1000/args.iters:8.3f} ms/iter")

        def pre_iter(carry, c):
            im = imgs.at[0, 0, 0, 0].set(c.astype(jnp.uint8))
            px = preprocess_images(im, BIOMEDCLIP_PREPROCESS)
            return carry + px.astype(jnp.float32).sum() * 1e-9, None

        @jax.jit
        def chainp(x0):
            out, _ = jax.lax.scan(pre_iter, x0, jnp.arange(args.iters, dtype=jnp.float32))
            return out
        float(chainp(x0))
        dt = min(_t(lambda: float(chainp(x0))) for _ in range(3)) - _rtt()
        print(f"{'preprocess only (batch %d)' % B:42s} {dt*1000/args.iters:8.3f} ms/iter")

    if {"rest", "all"} & what:
        # patchify+pos-embed+pre-LN (embeddings) and final LN+pool+proj+L2
        from flax.core import freeze
        imgs = jax.device_put(jnp.asarray(
            rng.randint(0, 256, (B, 224, 224, 3), np.uint8)))

        def stem_only(carry, c):
            px = preprocess_images(imgs, BIOMEDCLIP_PREPROCESS)
            px = px + carry[0, 0, 0] * 1e-9
            # run the tower but with 0 transformer layers is not
            # config-able post init; approximate: full minus (L*(attn+mlp))
            return carry + px.astype(jnp.float32).sum() * 1e-9, None

        @jax.jit
        def chain(x0):
            out, _ = jax.lax.scan(stem_only, x0, jnp.arange(args.iters))
            return out.sum()
        x0 = jnp.zeros((1, 1, 1), jnp.float32)
        float(chain(x0))
        dt = min(_t(lambda: float(chain(x0))) for _ in range(3)) - _rtt()
        print(f"{'preprocess only':42s} {dt * 1000 / args.iters:8.3f} ms/iter")

    if {"batches"} & what:
        for bb in (int(x) for x in args.batches.split(",")):
            tower, params, config = build_tower(bb)
            from emr2a_tpu.ops.preprocess import (BIOMEDCLIP_PREPROCESS,
                                                  preprocess_images)
            imgs = jax.device_put(jnp.asarray(
                rng.randint(0, 256, (bb, 224, 224, 3), np.uint8)))

            def full(carry, c):
                px = preprocess_images(imgs, BIOMEDCLIP_PREPROCESS)
                px = px + carry * 1e-9
                f = tower.apply({"params": params}, px.astype(jnp.bfloat16))
                f = f.astype(jnp.float32)
                f = f / (jnp.linalg.norm(f, -1, keepdims=True) + 1e-12)
                return carry + f.sum() * 1e-9, None

            @jax.jit
            def chain(x0):
                out, _ = jax.lax.scan(full, x0, jnp.arange(args.iters))
                return out
            x0 = jnp.float32(0)
            float(chain(x0))
            dt = min(_t(lambda: float(chain(x0))) for _ in range(3)) - _rtt()
            print(f"batch {bb:4d}: {bb * args.iters / dt:8.1f} slices/s "
                  f"({dt * 1000 / args.iters:.2f} ms/batch)")


if __name__ == "__main__":
    main()
