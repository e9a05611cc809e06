"""Fused cosine-similarity + top-k retrieval ops.

The reference's retrieval inner loop is a per-query ``np.dot`` plus a
full ``np.argsort`` of the whole DB (utils/cv_evaluator.py:107-130,
retrieval/evaluator.py:178-208).  TPU-native shape:

- ``cosine_topk``: one (q, dim) x (dim, n) MXU matmul + ``lax.top_k``.
  This is the DEFAULT and the measured winner: 0.706 ms at 1M x 256
  bf16 q=1 on a v5e chip (~725 GB/s effective — DB-read bandwidth
  optimal; scripts/exp_retrieval_scale.py, docs/PERF_NOTES.md).
- ``cosine_topk_pallas``: EXPERIMENTAL.  Streams DB tiles HBM→VMEM and
  fuses the score matmul with on-chip top-k selection.  In principle
  bandwidth-bound like the XLA path, but measured ~3x slower at 1M
  rows (2.24 ms vs 0.706; 0.092 vs 0.070 ms at 125k) across tile sizes
  2048-8192 — per-grid-step selection overhead dominates.  Kept as a
  documented experiment, default OFF everywhere
  (retrieval/database.py use_pallas=False).

Tie-breaking: both paths return the *lowest* DB index among equal
scores (``lax.top_k`` semantics).  The reference's
``np.argsort(sims)[-k:][::-1]`` breaks ties toward *higher* indices;
with float embeddings exact ties don't occur, so metric parity holds.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-3.4e38)  # plain float: jnp scalars become captured consts in Pallas


def pad_to_multiple(x: jax.Array, multiple: int, axis: int,
                    value: float = 0.0) -> jax.Array:
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_scores(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """(…, n) scores -> top-k (values, indices), descending."""
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("k", "normalize"))
def cosine_topk(queries: jax.Array, database: jax.Array, k: int,
                normalize: bool = True) -> Tuple[jax.Array, jax.Array]:
    """XLA path: full score matmul then top_k.

    queries (q, dim), database (n, dim) -> values (q, k), indices (q, k).
    """
    from emr2a_tpu.ops.similarity import l2_normalize_rows

    if normalize:
        queries = l2_normalize_rows(queries)
        database = l2_normalize_rows(database)
    scores = jnp.matmul(queries, database.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(scores, k)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

def _merge_topk(cand_vals, cand_idx, k):
    """Select top-k from (q, m) candidates by k iterations of
    argmax+mask — m is small (running k + tile top-k), VPU-friendly."""
    q, m = cand_vals.shape
    out_vals = []
    out_idx = []
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (q, m), 1)
    vals = cand_vals
    for _ in range(k):
        best = jnp.max(vals, axis=1)                      # (q,)
        best_col = jnp.argmax(vals, axis=1)               # (q,)
        onehot = col_iota == best_col[:, None]
        # Gather-free index pick: mask + row-sum (Mosaic has no gather).
        out_vals.append(best)
        out_idx.append(jnp.sum(jnp.where(onehot, cand_idx, 0), axis=1))
        vals = jnp.where(onehot, NEG_INF, vals)
    return jnp.stack(out_vals, axis=1), jnp.stack(out_idx, axis=1)


def _topk_tile(scores, base_idx, k):
    """Top-k of one (q, T) score tile via k argmax passes."""
    q, t = scores.shape
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (q, t), 1)
    vals = scores
    tv, ti = [], []
    for _ in range(k):
        best = jnp.max(vals, axis=1)
        best_col = jnp.argmax(vals, axis=1)
        tv.append(best)
        ti.append(best_col + base_idx)
        vals = jnp.where(col_iota == best_col[:, None], NEG_INF, vals)
    return jnp.stack(tv, axis=1), jnp.stack(ti, axis=1)


def _fused_topk_kernel(n_valid_ref, q_ref, db_ref, vals_out, idx_out,
                       run_vals, run_idx, *, k: int, tile: int):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    n_valid = n_valid_ref[0]

    @pl.when(step == 0)
    def _init():
        run_vals[:] = jnp.full_like(run_vals, NEG_INF)
        run_idx[:] = jnp.zeros_like(run_idx)

    # Scores for this DB tile: (q, dim) x (dim, T) on the MXU, f32 accum.
    scores = jax.lax.dot_general(
        q_ref[:], db_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (q, T)

    base = step * tile
    # Mask out padded DB rows past n_valid.
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    scores = jnp.where(col < n_valid, scores, NEG_INF)

    # Prune: the k-pass selection only runs when some row's tile max
    # beats that row's current k-th best — after the first few tiles
    # almost every tile skips it, leaving just matmul+max per tile.
    tile_max = jnp.max(scores, axis=1)            # (q,)
    kth_best = jnp.min(run_vals[:], axis=1)       # (q,)
    needs_update = jnp.any(tile_max > kth_best)

    @pl.when(needs_update)
    def _update():
        tile_vals, tile_idx = _topk_tile(scores, base, k)
        cand_vals = jnp.concatenate([run_vals[:], tile_vals], axis=1)
        cand_idx = jnp.concatenate([run_idx[:], tile_idx], axis=1)
        new_vals, new_idx = _merge_topk(cand_vals, cand_idx, k)
        run_vals[:] = new_vals
        run_idx[:] = new_idx

    @pl.when(step == n_steps - 1)
    def _emit():
        vals_out[:] = run_vals[:]
        idx_out[:] = run_idx[:]


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def cosine_topk_pallas(queries: jax.Array, database: jax.Array, k: int,
                       tile: int = 2048,
                       interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Fused streaming matmul+top-k.  Inputs must be pre-L2-normalized
    (call sites normalize once when the DB is built, not per query).

    queries (q, dim), database (n, dim); q and dim are padded to
    lane/sublane multiples internally; n is tile-padded with masking.
    """
    q, dim = queries.shape
    n, dim2 = database.shape
    assert dim == dim2, (dim, dim2)
    # Storage dtype is preserved (bf16 DB halves the HBM traffic that
    # bounds this op); the score dot always accumulates f32.
    qp = pad_to_multiple(queries.astype(database.dtype), 8, 0)
    qp = pad_to_multiple(qp, 128, 1)
    db = pad_to_multiple(database, 128, 1)
    db = pad_to_multiple(db, tile, 0)
    n_steps = db.shape[0] // tile
    qpad, dpad = qp.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((qpad, dpad), lambda i, n_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, dpad), lambda i, n_ref: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qpad, k), lambda i, n_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qpad, k), lambda i, n_ref: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((qpad, k), jnp.float32),
            pltpu.VMEM((qpad, k), jnp.int32),
        ],
    )
    vals, idx = pl.pallas_call(
        functools.partial(_fused_topk_kernel, k=k, tile=tile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qpad, k), jnp.float32),
            jax.ShapeDtypeStruct((qpad, k), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * qpad * dpad * db.shape[0],
            bytes_accessed=(db.size + qp.size) * db.dtype.itemsize,
            transcendentals=0,
        ),
    )(jnp.asarray([n], jnp.int32), qp, db)
    return vals[:q], idx[:q]
