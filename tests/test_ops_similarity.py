"""ops.similarity / ops.fusion vs pure-numpy reference semantics.

Goldens are computed with numpy exactly the way the reference does
(retrieval/similarity.py, retrieval/fusion.py, utils/common.py).
"""

import numpy as np
import pytest

from emr2a_tpu.ops import (
    concat_embeddings,
    cosine_similarity,
    cosine_similarity_matrix,
    early_fusion,
    euclidean_similarity,
    l2_normalize,
    l2_normalize_rows,
    late_fusion,
    normalize_scores,
)


def np_cosine(query, database):
    q = query / (np.linalg.norm(query) + 1e-8)
    db = database / (np.linalg.norm(database, axis=1, keepdims=True) + 1e-8)
    return db @ q


def test_cosine_similarity_matches_numpy(rng):
    q = rng.randn(64).astype(np.float32)
    db = rng.randn(100, 64).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(cosine_similarity(q, db)), np_cosine(q, db), rtol=1e-5, atol=1e-6)


def test_cosine_matrix_batches_single_query(rng):
    qs = rng.randn(7, 32).astype(np.float32)
    db = rng.randn(50, 32).astype(np.float32)
    mat = np.asarray(cosine_similarity_matrix(qs, db))
    for i in range(7):
        np.testing.assert_allclose(mat[i], np_cosine(qs[i], db), rtol=1e-5, atol=1e-6)


def test_euclidean_similarity(rng):
    q = rng.randn(16).astype(np.float32)
    db = rng.randn(30, 16).astype(np.float32)
    d = np.linalg.norm(db - q, axis=1)
    expected = 1.0 - d / d.max()
    np.testing.assert_allclose(
        np.asarray(euclidean_similarity(q, db)), expected, rtol=1e-5, atol=1e-6)


def test_l2_normalize_zero_guard():
    z = np.zeros(8, np.float32)
    np.testing.assert_array_equal(np.asarray(l2_normalize(z)), z)
    v = np.array([3.0, 4.0], np.float32)
    np.testing.assert_allclose(np.asarray(l2_normalize(v)), [0.6, 0.8], rtol=1e-6)


def test_l2_normalize_rows(rng):
    x = rng.randn(5, 9).astype(np.float32)
    out = np.asarray(l2_normalize_rows(x))
    expected = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


@pytest.mark.parametrize("mode", ["none", "zscore", "minmax"])
def test_normalize_scores(mode, rng):
    s = rng.randn(40).astype(np.float32)
    got = np.asarray(normalize_scores(s, mode))
    if mode == "none":
        expected = s
    elif mode == "zscore":
        expected = (s - s.mean()) / (s.std() + 1e-8)
    else:
        expected = (s - s.min()) / (s.max() - s.min() + 1e-8)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_late_fusion(rng):
    t = rng.randn(25).astype(np.float32)
    i = rng.randn(25).astype(np.float32)
    got = np.asarray(late_fusion(t, i, text_weight=0.3))
    np.testing.assert_allclose(got, 0.3 * t + 0.7 * i, rtol=1e-5, atol=1e-6)


def test_early_fusion(rng):
    t = rng.randn(4, 8).astype(np.float32)
    i = rng.randn(4, 8).astype(np.float32)
    got = np.asarray(early_fusion(t, i, 0.4, 0.6))
    fused = np.concatenate([t * 0.4, i * 0.6], axis=-1)
    expected = fused / (np.linalg.norm(fused, axis=1, keepdims=True) + 1e-8)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_concat_embeddings_vector(rng):
    t = rng.randn(8).astype(np.float32)
    i = rng.randn(8).astype(np.float32)
    got = np.asarray(concat_embeddings(t, i, 2.0, 0.5))
    fused = np.concatenate([t * 2.0, i * 0.5])
    expected = fused / np.linalg.norm(fused)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
