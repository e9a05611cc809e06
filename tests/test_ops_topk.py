"""cosine_topk (XLA and Pallas-interpret) vs numpy argsort reference."""

import numpy as np
import pytest

from emr2a_tpu.ops.topk import (
    cosine_topk,
    cosine_topk_pallas,
    pad_to_multiple,
    topk_scores,
)


def np_reference_topk(queries, db, k):
    qn = queries / (np.linalg.norm(queries, axis=1, keepdims=True) + 1e-8)
    dn = db / (np.linalg.norm(db, axis=1, keepdims=True) + 1e-8)
    scores = qn @ dn.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, idx, axis=1)
    return vals, idx


def test_pad_to_multiple(rng):
    x = rng.randn(5, 3).astype(np.float32)
    import jax.numpy as jnp
    p = pad_to_multiple(jnp.asarray(x), 4, 0)
    assert p.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(p[:5]), x)
    assert np.all(np.asarray(p[5:]) == 0)


def test_cosine_topk_matches_numpy(rng):
    q = rng.randn(9, 37).astype(np.float32)
    db = rng.randn(123, 37).astype(np.float32)
    vals, idx = cosine_topk(q, db, 5)
    evals, eidx = np_reference_topk(q, db, 5)
    np.testing.assert_array_equal(np.asarray(idx), eidx)
    np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-5, atol=1e-6)


def test_topk_scores(rng):
    s = rng.randn(4, 60).astype(np.float32)
    vals, idx = topk_scores(s, 7)
    eidx = np.argsort(-s, axis=1, kind="stable")[:, :7]
    np.testing.assert_array_equal(np.asarray(idx), eidx)


@pytest.mark.parametrize("n,dim,q,k,tile", [
    (100, 64, 4, 5, 32),     # tail-padded DB
    (256, 128, 8, 3, 128),   # exact tiles
    (513, 40, 2, 10, 256),   # odd everything
])
def test_cosine_topk_pallas_interpret(rng, n, dim, q, k, tile):
    qs = rng.randn(q, dim).astype(np.float32)
    db = rng.randn(n, dim).astype(np.float32)
    qn = qs / (np.linalg.norm(qs, axis=1, keepdims=True) + 1e-8)
    dn = db / (np.linalg.norm(db, axis=1, keepdims=True) + 1e-8)
    vals, idx = cosine_topk_pallas(qn, dn, k, tile=tile, interpret=True)
    evals, eidx = np_reference_topk(qs, db, k)
    np.testing.assert_array_equal(np.asarray(idx), eidx)
    np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-4, atol=1e-5)
