"""Sharded embedding DB: per-shard top-k + global merge on an 8-way mesh."""

import numpy as np
import pytest

from emr2a_tpu.retrieval.database import ShardedEmbeddingDatabase


def np_reference_topk(queries, db, k):
    qn = queries / (np.linalg.norm(queries, axis=1, keepdims=True) + 1e-8)
    dn = db / (np.linalg.norm(db, axis=1, keepdims=True) + 1e-8)
    scores = qn @ dn.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, idx, axis=1)
    return vals, idx


@pytest.mark.parametrize("n", [64, 100, 1000, 37])
def test_sharded_topk_matches_full_scan(mesh8, rng, n):
    dim, q, k = 48, 6, 5
    db = rng.randn(n, dim).astype(np.float32)
    queries = rng.randn(q, dim).astype(np.float32)
    sdb = ShardedEmbeddingDatabase(db, mesh=mesh8)
    vals, idx = sdb.topk(queries, k)
    evals, eidx = np_reference_topk(queries, db, k)
    np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-4, atol=1e-5)
    # Indices may differ only where scores tie; check score parity per slot.
    got_idx = np.asarray(idx)
    assert got_idx.max() < n
    same = got_idx == eidx
    if not same.all():
        # any mismatch must be a tie
        mism = ~same
        np.testing.assert_allclose(np.asarray(vals)[mism], evals[mism],
                                   rtol=1e-4, atol=1e-5)


def test_search_returns_metadata(mesh8, rng):
    n, dim = 40, 16
    db = rng.randn(n, dim).astype(np.float32)
    labels = [f"L{i % 4}" for i in range(n)]
    ids = [f"p{i:03d}" for i in range(n)]
    sdb = ShardedEmbeddingDatabase(db, labels=labels, ids=ids, mesh=mesh8)
    hits = sdb.search(db[:3], k=3)
    assert len(hits) == 3
    # A case's own embedding must be its nearest neighbor.
    for qi in range(3):
        assert hits[qi][0]["index"] == qi
        assert hits[qi][0]["patient_id"] == ids[qi]
        assert hits[qi][0]["score"] == pytest.approx(1.0, abs=1e-4)


def test_single_query_vector(mesh8, rng):
    db = rng.randn(32, 8).astype(np.float32)
    sdb = ShardedEmbeddingDatabase(db, mesh=mesh8)
    vals, idx = sdb.topk(db[7], k=1)
    assert int(np.asarray(idx)[0, 0]) == 7
