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


def test_add_cases_and_persistence(mesh8, rng, tmp_path):
    db0 = rng.randn(20, 16).astype(np.float32)
    sdb = ShardedEmbeddingDatabase(db0, labels=[f"L{i%2}" for i in range(20)],
                                   ids=[f"p{i}" for i in range(20)], mesh=mesh8)
    extra = rng.randn(7, 16).astype(np.float32)
    sdb.add_cases(extra, labels=["LX"] * 7, ids=[f"x{i}" for i in range(7)])
    assert sdb.n == 27
    # a new case retrieves itself
    hits = sdb.search(extra[3][None, :], k=1)
    assert hits[0][0]["patient_id"] == "x3"
    assert hits[0][0]["score"] == pytest.approx(1.0, abs=1e-4)

    # a failed append (wrong width) must not touch rows OR metadata —
    # a half-applied add would silently misalign labels with rows
    with pytest.raises(ValueError, match="dim"):
        sdb.add_cases(rng.randn(2, 8).astype(np.float32),
                      labels=["LZ"] * 2, ids=["z0", "z1"])
    assert sdb.n == 27 and len(sdb.labels) == 27 and len(sdb.ids) == 27

    path = tmp_path / "db.npz"
    sdb.save(path)
    loaded = ShardedEmbeddingDatabase.load(path, mesh=mesh8)
    assert loaded.n == 27
    v1, i1 = sdb.topk(db0[:4], k=3)
    v2, i2 = loaded.topk(db0[:4], k=3)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
    assert loaded.labels[-1] == "LX" and loaded.ids[0] == "p0"


def test_int8_quantized_mode(mesh8, rng):
    """int8 storage: top-1 self-retrieval exact; top-5 overlap with the
    f32 ranking high (approximate mode contract)."""
    import jax.numpy as jnp
    n, dim, q, k = 400, 64, 16, 5
    db = rng.randn(n, dim).astype(np.float32)
    queries = db[:q] + 0.05 * rng.randn(q, dim).astype(np.float32)
    f32 = ShardedEmbeddingDatabase(db, mesh=mesh8)
    i8 = ShardedEmbeddingDatabase(db, mesh=mesh8, dtype=jnp.int8)
    v_f, i_f = f32.topk(queries, k)
    v_q, i_q = i8.topk(queries, k)
    i_f, i_q = np.asarray(i_f), np.asarray(i_q)
    # top-1 must match (queries are near-copies of DB rows)
    np.testing.assert_array_equal(i_f[:, 0], i_q[:, 0])
    # top-5 sets strongly overlap
    overlap = np.mean([len(set(a) & set(b)) / k for a, b in zip(i_f, i_q)])
    assert overlap >= 0.9, overlap
    # scores close to the true cosine
    np.testing.assert_allclose(np.asarray(v_q), np.asarray(v_f),
                               atol=0.03, rtol=0.05)
    # ingestion works in quantized mode too
    extra = rng.randn(3, dim).astype(np.float32)
    i8.add_cases(extra)
    v2, i2 = i8.topk(extra[:1], k=1)
    assert int(np.asarray(i2)[0, 0]) == n


def test_capacity_streaming_ingestion(mesh8, rng):
    """With reserved capacity, add_cases updates device rows in place
    (no shape change) and queries immediately see new cases."""
    db0 = rng.randn(16, 8).astype(np.float32)
    sdb = ShardedEmbeddingDatabase(db0, mesh=mesh8, capacity=64,
                                   ids=[f"p{i}" for i in range(16)])
    buf_shape = sdb.db.shape
    compiled_before = dict(sdb._jitted)
    for batch in range(3):
        extra = rng.randn(5, 8).astype(np.float32)
        sdb.add_cases(extra, ids=[f"b{batch}_{i}" for i in range(5)])
        hits = sdb.search(extra[2][None, :], k=1)
        assert hits[0][0]["patient_id"] == f"b{batch}_2"
    assert sdb.db.shape == buf_shape        # no re-allocation
    assert sdb.n == 31
    # old cases still retrievable
    assert sdb.search(db0[1][None, :], k=1)[0][0]["patient_id"] == "p1"
    # overflow past capacity falls back to re-upload and still works
    sdb.add_cases(rng.randn(50, 8).astype(np.float32),
                  ids=[f"z{i}" for i in range(50)])
    assert sdb.n == 81
    assert sdb.db.shape[0] >= 81


def test_metadata_alignment_enforced(mesh8, rng):
    db = ShardedEmbeddingDatabase(rng.randn(8, 4).astype(np.float32),
                                  mesh=mesh8)  # no labels/ids
    with pytest.raises(ValueError, match="labels"):
        db.add_cases(rng.randn(2, 4).astype(np.float32), labels=["x", "y"])
    db2 = ShardedEmbeddingDatabase(rng.randn(8, 4).astype(np.float32),
                                   labels=["a"] * 8, mesh=mesh8)
    with pytest.raises(ValueError, match="labels"):
        db2.add_cases(rng.randn(2, 4).astype(np.float32))
    with pytest.raises(ValueError, match="len"):
        db2.add_cases(rng.randn(2, 4).astype(np.float32), labels=["only-one"])


def test_k_clamped_to_n(mesh8, rng):
    db0 = rng.randn(10, 8).astype(np.float32)
    db = ShardedEmbeddingDatabase(db0, labels=[f"L{i}" for i in range(10)],
                                  mesh=mesh8)
    hits = db.search(db0[:1], k=25)
    assert len(hits[0]) == 10  # clamped; no filler candidates
    assert all(h["score"] > -1.0 for h in hits[0])


def test_capacity_geometric_growth(mesh8, rng):
    """Overflowing a capacity-reserved DB grows it geometrically:
    repeated appends amortize to O(log) rebuilds, retrieval stays
    exact."""
    db = ShardedEmbeddingDatabase(
        rng.randn(16, 32).astype(np.float32), mesh=mesh8, capacity=24)
    rebuilds = [0]
    orig = db._upload
    db._upload = lambda: (rebuilds.__setitem__(0, rebuilds[0] + 1), orig())
    for _ in range(20):
        db.add_cases(rng.randn(8, 32).astype(np.float32))
    assert db.n == 176
    assert rebuilds[0] <= 4  # was ~19 with fixed capacity
    q = rng.randn(3, 32).astype(np.float32)
    _, idx = db.topk(q, 5)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    ref_idx = np.argsort(-(qn @ db._host_emb.T), axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def _write_step2_npz(path, rng, pids, dim=16, seed_centers=None):
    """Synthetic step2 artifact: patient_id -> (n_slices, dim)."""
    payload = {}
    for i, p in enumerate(pids):
        center = (seed_centers[i % len(seed_centers)]
                  if seed_centers is not None else rng.randn(dim))
        payload[p] = (center[None, :]
                      + rng.randn(3, dim) * 0.05).astype(np.float32)
    np.savez_compressed(path, **payload)
    return payload


def _write_manifest(path, pids, labels):
    import json
    with open(path, "w", encoding="utf-8") as f:
        for p, l in zip(pids, labels):
            f.write(json.dumps({"patient_id": p, "label": l}) + "\n")


@pytest.mark.parametrize("dtype", ["f32", "int8"])
def test_database_cli_build_query_add(mesh8, rng, tmp_path, dtype):
    """The user-facing entry to the sharded 1M path: build from a step2
    embeddings.npz, query with labels/ids attached, stream-add new
    cases, query again — all through the CLI."""
    import json
    from emr2a_tpu.retrieval.database_cli import main

    dim = 16
    centers = rng.randn(4, dim) * 3
    pids = [f"p{i:03d}" for i in range(24)]
    labels = [f"L{i % 4}" for i in range(24)]
    _write_step2_npz(tmp_path / "embeddings.npz", rng, pids,
                     dim, seed_centers=centers)
    _write_manifest(tmp_path / "manifest.jsonl", pids, labels)

    db_path = tmp_path / "db.npz"
    main(["build", "--embeddings_path", str(tmp_path / "embeddings.npz"),
          "--manifest_path", str(tmp_path / "manifest.jsonl"),
          "--db", str(db_path), "--capacity", "64", "--dtype", dtype])
    assert db_path.exists()

    # query with the training npz itself: nearest hit is the query case
    hits_path = tmp_path / "hits.jsonl"
    main(["query", "--db", str(db_path),
          "--queries_path", str(tmp_path / "embeddings.npz"),
          "--k", "3", "--dtype", dtype, "--output", str(hits_path)])
    rows = [json.loads(l) for l in hits_path.read_text().splitlines()]
    assert len(rows) == 24
    for row in rows:
        top = row["hits"][0]
        # int8's per-row quantization (|cos err| <~ 1/64) cannot split
        # near-duplicate center-mates, so exact self-retrieval is an
        # f32-only guarantee; class-level ranking must hold for both.
        if dtype == "f32":
            assert top["patient_id"] == row["query_id"]
        assert top["label"] == labels[pids.index(row["query_id"])]
        assert top["score"] > 0.99

    # stream-add 8 new patients (new npz includes some already present
    # — only genuinely new ids are appended)
    new_pids = pids[:2] + [f"q{i:03d}" for i in range(8)]
    # label must track the center each row is drawn from (centers[i%4]
    # over the enumerate index in _write_step2_npz)
    new_labels = [f"L{i % 4}" for i in range(len(new_pids))]
    _write_step2_npz(tmp_path / "new.npz", rng, new_pids, dim,
                     seed_centers=centers)
    _write_manifest(tmp_path / "new_manifest.jsonl", new_pids, new_labels)
    main(["add", "--db", str(db_path),
          "--embeddings_path", str(tmp_path / "new.npz"),
          "--manifest_path", str(tmp_path / "new_manifest.jsonl"),
          "--dtype", dtype])

    main(["query", "--db", str(db_path),
          "--queries_path", str(tmp_path / "new.npz"),
          "--k", "1", "--dtype", dtype, "--output", str(hits_path)])
    rows = [json.loads(l) for l in hits_path.read_text().splitlines()]
    assert len(rows) == 10
    for row in rows:
        top = row["hits"][0]
        if row["query_id"].startswith("q") and dtype == "f32":
            # genuinely-new case: its stored vector IS this query's mean
            assert top["patient_id"] == row["query_id"]
        else:
            # p000/p001 were skipped as duplicates; the re-sampled query
            # must still land on a same-class neighbor
            expected = new_labels[new_pids.index(row["query_id"])]
            assert top["label"] == expected


def test_use_pallas_disabled_under_padding(mesh8, rng):
    """use_pallas with capacity padding must fall back to the XLA scan:
    the fused kernel scores padding rows as real 0-cosine candidates
    inside its running top-k, which can displace true negative-score
    neighbors before the caller's re-mask."""
    emb = rng.randn(20, 16).astype(np.float32)
    q = rng.randn(3, 16).astype(np.float32)
    ref = ShardedEmbeddingDatabase(emb, mesh=mesh8)
    padded = ShardedEmbeddingDatabase(emb, mesh=mesh8, use_pallas=True,
                                      capacity=64)
    vref, iref = ref.topk(q, k=5)
    vpad, ipad = padded.topk(q, k=5)
    np.testing.assert_array_equal(np.asarray(ipad), np.asarray(iref))
    np.testing.assert_allclose(np.asarray(vpad), np.asarray(vref),
                               rtol=1e-5)


def test_database_cli_matrix_form_ingest(mesh8, rng, tmp_path):
    """The CLI accepts matrix-form npz (patient_ids + image_matrix —
    the CV runner's combined_embeddings.npz cache, the only practical
    layout at 1M cases) and must build a database identical to the
    per-patient-key layout; query --repeat logs steady-state latency."""
    import json as _json
    from emr2a_tpu.retrieval.database_cli import main

    n, dim = 24, 16
    emb = rng.randn(n, dim).astype(np.float32)
    ids = [f"p{i:03d}" for i in range(n)]
    # per-key layout (each patient a (slices, dim) matrix)
    np.savez(tmp_path / "perkey.npz",
             **{pid: emb[i][None] for i, pid in enumerate(ids)})
    # matrix layout
    np.savez(tmp_path / "matrix.npz", patient_ids=np.asarray(ids),
             image_matrix=emb)
    np.savez(tmp_path / "queries.npz", patient_ids=np.asarray(ids[:4]),
             image_matrix=emb[:4])

    hits = {}
    for form in ("perkey", "matrix"):
        main(["build", "--embeddings_path", str(tmp_path / f"{form}.npz"),
              "--db", str(tmp_path / f"db_{form}.npz"), "--dtype", "int8"])
        out = tmp_path / f"hits_{form}.jsonl"
        main(["query", "--db", str(tmp_path / f"db_{form}.npz"),
              "--queries_path", str(tmp_path / "queries.npz"),
              "--k", "3", "--dtype", "int8", "--repeat", "3",
              "--output", str(out)])
        hits[form] = [_json.loads(l) for l in
                      out.read_text().splitlines()]
    assert hits["matrix"] == hits["perkey"]
    # every query is its own source row: self-match at rank 1
    for row in hits["matrix"]:
        assert row["hits"][0]["patient_id"] == row["query_id"]


def test_topk_chained_matches_unchained(mesh8, rng):
    """The chained single-query latency probe (repeats scans in one
    jit, 1e-9 perturbation per iteration) must return exactly the
    plain topk result — int8 and f32 modes."""
    import jax.numpy as jnp
    from emr2a_tpu.retrieval.database import ShardedEmbeddingDatabase

    emb = rng.randn(40, 16).astype(np.float32)
    q = rng.randn(16).astype(np.float32)
    for dtype in (jnp.float32, jnp.int8):
        db = ShardedEmbeddingDatabase(emb, dtype=dtype)
        vref, iref = db.topk(q, k=5)
        vch, ich = db.topk_chained(q, k=5, repeats=7)
        np.testing.assert_array_equal(np.asarray(ich), np.asarray(iref))
        np.testing.assert_allclose(np.asarray(vch), np.asarray(vref),
                                   rtol=1e-5, atol=1e-6)


def test_database_cli_chained_mode(mesh8, rng, tmp_path, caplog):
    """query --chained logs a device-p50 per-query latency line."""
    import logging
    from emr2a_tpu.retrieval.database_cli import main

    n, dim = 24, 16
    emb = rng.randn(n, dim).astype(np.float32)
    ids = [f"p{i:03d}" for i in range(n)]
    np.savez(tmp_path / "emb.npz", patient_ids=np.asarray(ids),
             image_matrix=emb)
    main(["build", "--embeddings_path", str(tmp_path / "emb.npz"),
          "--db", str(tmp_path / "db.npz"), "--dtype", "int8"])
    with caplog.at_level(logging.INFO,
                         logger="emr2a_tpu.retrieval.database_cli"):
        main(["query", "--db", str(tmp_path / "db.npz"),
              "--queries_path", str(tmp_path / "emb.npz"),
              "--k", "3", "--dtype", "int8", "--repeat", "8",
              "--chained", "--output", str(tmp_path / "hits.jsonl")])
    assert any("device p50" in r.message for r in caplog.records)
