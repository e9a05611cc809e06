"""Similarity primitives as jitted, batched XLA ops.

Semantics parity with the reference (retrieval/similarity.py:4-15 and
utils/common.py:4-9), but re-shaped for the MXU: the reference computes
one query against the DB per Python-loop iteration; here the native
shape is ``Q @ DB.T`` — a single (n_queries, dim) x (dim, n_db) matmul
that XLA tiles onto the systolic array.  Single-query calls are the
batched op with Q=1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

EPS = 1e-8


@jax.jit
def l2_normalize(vec: jax.Array) -> jax.Array:
    """Single-vector L2 norm with the reference's zero-guard
    (utils/common.py:4-9: returns the input unchanged when norm == 0)."""
    norm = jnp.linalg.norm(vec)
    return jnp.where(norm == 0, vec, vec / jnp.where(norm == 0, 1.0, norm))


@jax.jit
def l2_normalize_rows(x: jax.Array, eps: float = EPS) -> jax.Array:
    """Row-wise L2 normalization with +eps in the denominator
    (cv_evaluator.py:95-97 convention)."""
    norms = jnp.linalg.norm(x, axis=-1, keepdims=True) + eps
    return x / norms


@jax.jit
def cosine_similarity(query: jax.Array, database: jax.Array) -> jax.Array:
    """One query vs DB. Parity: retrieval/similarity.py:4-7.

    query: (dim,), database: (n, dim) -> (n,)
    """
    q = query / (jnp.linalg.norm(query) + EPS)
    db = l2_normalize_rows(database)
    return db @ q


@partial(jax.jit, static_argnames=("normalize",))
def cosine_similarity_matrix(queries: jax.Array, database: jax.Array,
                             normalize: bool = True) -> jax.Array:
    """Batched scores: (q, dim) x (n, dim) -> (q, n) in one MXU matmul.

    With ``normalize=False`` inputs are assumed pre-normalized (the CV
    evaluator L2-normalizes after PCA, so its score is a plain dot —
    cv_evaluator.py:107-112).
    Accumulation is forced to f32 so bf16 inputs keep ranking fidelity.
    """
    if normalize:
        queries = l2_normalize_rows(queries)
        database = l2_normalize_rows(database)
    return jnp.matmul(queries, database.T, preferred_element_type=jnp.float32)


@jax.jit
def euclidean_similarity(query: jax.Array, database: jax.Array) -> jax.Array:
    """Max-normalized euclidean distance as similarity.
    Parity: retrieval/similarity.py:10-15."""
    distances = jnp.linalg.norm(database - query[None, :], axis=1)
    max_dist = jnp.max(distances)
    return jnp.where(max_dist > 0, 1.0 - distances / max_dist, 1.0 - distances)
