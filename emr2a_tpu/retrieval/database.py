"""Mesh-sharded, HBM-resident embedding database with global top-k.

Net-new capability vs the reference (SURVEY.md §2.2: the reference scans
the whole DB with per-query numpy loops on one host).  Design:

- The (n_cases, dim) embedding matrix lives in HBM sharded over the
  ``data`` mesh axis along the case dimension; each chip owns an
  n/n_shards slab.
- Queries are replicated (they're tiny).  Inside ``shard_map`` each
  chip computes a fused local matmul+top-k over its slab (masked for
  tail padding), offsets local indices to global, then the k·n_shards
  candidates are all-gathered over ICI and re-top-k'd.  The merge
  traffic is k·n_shards scores per query — bytes, not the DB.
- Scores use f32 accumulation; the DB can be stored bf16 for 2× HBM
  bandwidth at ranking-equivalent fidelity.
"""

from __future__ import annotations

import functools
import logging
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emr2a_tpu.ops.similarity import l2_normalize_rows
from emr2a_tpu.ops.topk import NEG_INF, cosine_topk_pallas
from emr2a_tpu.parallel.mesh import DATA_AXIS, default_mesh

logger = logging.getLogger(__name__)


def quantize_rows_int8(x: np.ndarray):
    """Symmetric per-row int8 quantization: returns (int8 values,
    f32 per-row scales)."""
    x = np.asarray(x, dtype=np.float32)
    scales = np.abs(x).max(axis=1) / 127.0
    scales = np.where(scales == 0, 1.0, scales)
    q = np.clip(np.rint(x / scales[:, None]), -127, 127).astype(np.int8)
    return q, scales.astype(np.float32)


def _local_masked_topk(queries, db_shard, n_valid_local, base, k, use_pallas,
                       db_scales=None):
    """Per-shard fused scores + top-k with tail-padding masked out."""
    if db_scales is not None:
        # int8 path: quantize queries per-row, int32 MXU accumulation,
        # rescale with per-row scales.  4x less DB HBM traffic.
        qscale = jnp.max(jnp.abs(queries), axis=1) / 127.0
        qscale = jnp.where(qscale == 0, 1.0, qscale)
        q8 = jnp.clip(jnp.rint(queries / qscale[:, None]),
                      -127, 127).astype(jnp.int8)
        scores_i32 = jax.lax.dot_general(
            q8, db_shard, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        scores = (scores_i32.astype(jnp.float32)
                  * qscale[:, None] * db_scales[None, :])
    elif use_pallas:
        vals, idx = cosine_topk_pallas(queries, db_shard, k)
        # cosine_topk_pallas masks its own internal padding at the tile
        # level but not shard-level padding, so re-mask here.
        valid = idx < n_valid_local
        vals = jnp.where(valid, vals, NEG_INF)
        return vals, idx + base
    else:
        scores = jnp.matmul(queries, db_shard.T,
                            preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < n_valid_local, scores, NEG_INF)
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx + base


def _sharded_topk_fn(queries, db_shard, n_total, db_scales=None, *, k,
                     shard_size, use_pallas):
    shard_id = jax.lax.axis_index(DATA_AXIS)
    base = shard_id * shard_size
    n_valid_local = jnp.clip(n_total - base, 0, shard_size)
    # per-shard candidates: k may exceed the slab when n barely exceeds
    # k; n_shards * min(k, shard_size) >= k always holds for k <= n.
    k_local = min(k, shard_size)
    vals, idx = _local_masked_topk(queries, db_shard, n_valid_local, base,
                                   k_local, use_pallas, db_scales)
    # Gather every shard's candidates: (n_shards, q, k) -> (q, n_shards*k).
    all_vals = jax.lax.all_gather(vals, DATA_AXIS)
    all_idx = jax.lax.all_gather(idx, DATA_AXIS)
    q = vals.shape[0]
    all_vals = jnp.moveaxis(all_vals, 0, 1).reshape(q, -1)
    all_idx = jnp.moveaxis(all_idx, 0, 1).reshape(q, -1)
    mvals, mcols = jax.lax.top_k(all_vals, k)
    midx = jnp.take_along_axis(all_idx, mcols, axis=1)
    return mvals, midx


@functools.partial(jax.jit, donate_argnums=(0,))
def _update_rows(buf, new_rows, start):
    # start is traced so streaming ingestion compiles once per new-batch
    # shape, not once per offset
    return jax.lax.dynamic_update_slice(buf, new_rows, (start, 0))


@functools.partial(jax.jit, donate_argnums=(0,))
def _update_rows_1d(buf, new_rows, start):
    return jax.lax.dynamic_update_slice(buf, new_rows, (start,))


class ShardedEmbeddingDatabase:
    """Case-retrieval database sharded over the mesh ``data`` axis.

    Parameters
    ----------
    embeddings : (n, dim) array — case embeddings (rows need not be
        normalized; pass ``normalize=True`` to L2-normalize once on load,
        making every later query a plain dot product).
    labels / ids : optional per-case metadata for ``search``.
    dtype : storage dtype; bf16 halves HBM traffic.
    """

    def __init__(self, embeddings: np.ndarray,
                 labels: Optional[Sequence[str]] = None,
                 ids: Optional[Sequence[str]] = None,
                 mesh: Optional[Mesh] = None,
                 normalize: bool = True,
                 dtype: jnp.dtype = jnp.float32,
                 use_pallas: bool = False,
                 capacity: Optional[int] = None):
        self.mesh = mesh or default_mesh()
        self.n, self.dim = embeddings.shape
        # Serving mode: reserving capacity keeps the device buffer shape
        # fixed so streaming add_cases() updates rows in place with no
        # re-upload and no kernel recompiles.
        self.capacity = capacity
        self.labels = list(labels) if labels is not None else None
        self.ids = list(ids) if ids is not None else None
        self.use_pallas = use_pallas
        emb = np.asarray(embeddings, dtype=np.float32)
        if normalize:
            emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-12)
        self.dtype = dtype
        self._host_emb = emb  # normalized f32, unpadded (ingest/persist)
        self._upload()

    def _upload(self) -> None:
        """(Re)shard the host matrix onto the mesh in the storage dtype."""
        n_shards = self.mesh.shape[DATA_AXIS]
        emb = self._host_emb
        self.n = emb.shape[0]
        target = max(self.n, self.capacity or 0)
        pad = target - self.n + ((-target) % n_shards)
        if pad:
            emb = np.pad(emb, ((0, pad), (0, 0)))
        self.shard_size = emb.shape[0] // n_shards
        row_sharding = NamedSharding(self.mesh, P(DATA_AXIS, None))
        if self.dtype == jnp.int8:
            # Quantized mode: per-row symmetric int8 + f32 scales —
            # 4x less HBM traffic per scan, int32 MXU accumulation.
            # Approximate ranking (|cos error| <~ 1/64); see tests.
            q8, scales = quantize_rows_int8(emb)
            self.db = jax.device_put(jnp.asarray(q8), row_sharding)
            self.db_scales = jax.device_put(
                jnp.asarray(scales), NamedSharding(self.mesh, P(DATA_AXIS)))
        else:
            self.db = jax.device_put(jnp.asarray(emb, dtype=self.dtype),
                                     row_sharding)
            self.db_scales = None
        self._jitted = {}

    def _get_topk(self, k: int):
        if k not in self._jitted:
            quantized = self.db_scales is not None
            # The experimental Pallas kernel scores padding rows as
            # real 0-cosine candidates inside its running top-k (it has
            # no valid-row input), which can displace true negative-
            # score neighbors before the caller's re-mask — so it is
            # only sound when the padded buffer is exactly full.  It
            # also loses to XLA at every measured scale
            # (docs/PERF_NOTES.md), hence experiment-only.
            padded = self.shard_size * self.mesh.shape[DATA_AXIS] != self.n
            use_pallas = self.use_pallas and not quantized and not padded
            if self.use_pallas and not use_pallas:
                logger.warning(
                    "use_pallas disabled: the fused top-k kernel cannot "
                    "mask %s", "int8 scales" if quantized else
                    "capacity/shard padding rows")
            in_specs = (P(), P(DATA_AXIS, None), P()) + (
                (P(DATA_AXIS),) if quantized else ())
            fn = jax.shard_map(
                functools.partial(
                    _sharded_topk_fn, k=k,
                    shard_size=self.shard_size, use_pallas=use_pallas),
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=(P(), P()),
                check_vma=False,
            )
            self._jitted[k] = jax.jit(fn)
        return self._jitted[k]

    def topk(self, queries: np.ndarray, k: int,
             normalize: bool = True) -> Tuple[jax.Array, jax.Array]:
        """(q, dim) queries -> (values (q, k), global indices (q, k)).
        k is clamped to the number of cases (filler candidates from
        shard padding never surface)."""
        k = min(k, self.n)
        qdtype = jnp.float32 if self.db_scales is not None else self.db.dtype
        q = jnp.asarray(queries, dtype=qdtype)
        if q.ndim == 1:
            q = q[None, :]
        if normalize:
            q = l2_normalize_rows(q).astype(qdtype)
        q = jax.device_put(q, NamedSharding(self.mesh, P()))
        n = jnp.int32(self.n)
        if self.db_scales is not None:
            return self._get_topk(k)(q, self.db, n, self.db_scales)
        return self._get_topk(k)(q, self.db, n)

    def topk_chained(self, query: np.ndarray, k: int, repeats: int = 256,
                     normalize: bool = True) -> Tuple[jax.Array, jax.Array]:
        """Single-query DEVICE latency probe: run ``repeats``
        back-to-back (1, dim) scans inside ONE jit (``lax.scan``) and
        read back one result — wall / repeats is the per-query device
        latency with the ~30 ms host<->device sync amortized out (the
        BASELINE "top-5 over 1M < 1 ms p50" protocol; a plain
        ``search`` call would measure the relay instead).  Each
        iteration perturbs the query by ``i * 1e-9`` so XLA cannot
        hoist the loop-invariant scan out of the chain; the
        perturbation is ~1e-7 of a unit-norm query at the final
        iteration, far below ranking resolution (pinned equal to the
        unchained result in tests/test_sharded_database.py)."""
        k = min(k, self.n)
        qdtype = jnp.float32 if self.db_scales is not None else self.db.dtype
        q = jnp.asarray(query, dtype=qdtype).reshape(1, -1)
        if normalize:
            q = l2_normalize_rows(q).astype(qdtype)
        q = jax.device_put(q, NamedSharding(self.mesh, P()))
        inner = self._get_topk(k)
        quantized = self.db_scales is not None
        key = ("chained", k, repeats, quantized)
        if key not in self._jitted:
            def run(q, db, n, db_scales=None):
                def body(carry, i):
                    qi = q + (i.astype(jnp.float32)
                              * 1e-9).astype(q.dtype)
                    args = (qi, db, n) + (
                        (db_scales,) if db_scales is not None else ())
                    vals, idx = inner(*args)
                    return (vals, idx), None

                init = (jnp.zeros((1, k), jnp.float32),
                        jnp.zeros((1, k), jnp.int32))
                (vals, idx), _ = jax.lax.scan(
                    body, init, jnp.arange(repeats))
                return vals, idx

            self._jitted[key] = jax.jit(run)
        n = jnp.int32(self.n)
        if quantized:
            return self._jitted[key](q, self.db, n, self.db_scales)
        return self._jitted[key](q, self.db, n)

    # -- serving: incremental updates + persistence --

    def add_cases(self, embeddings: np.ndarray,
                  labels: Optional[Sequence[str]] = None,
                  ids: Optional[Sequence[str]] = None,
                  normalize: bool = True) -> None:
        """Append cases to the database (serving-path ingestion).

        With reserved ``capacity`` the new rows are written into the
        sharded device buffer in place (no re-upload, no recompiles);
        past capacity the buffer is rebuilt.  Metadata must stay
        index-aligned: provide labels/ids exactly when the database was
        built with them.
        """
        new = np.asarray(embeddings, dtype=np.float32)
        if new.ndim == 1:
            new = new[None, :]
        if normalize:
            new = new / (np.linalg.norm(new, axis=1, keepdims=True) + 1e-12)
        if (self.labels is None) != (labels is None):
            raise ValueError(
                "add_cases labels must match the database: provide labels "
                "iff it was built with labels (metadata stays row-aligned)")
        if (self.ids is None) != (ids is None):
            raise ValueError(
                "add_cases ids must match the database: provide ids iff it "
                "was built with ids")
        if labels is not None and len(labels) != new.shape[0]:
            raise ValueError("len(labels) must equal the number of new rows")
        if ids is not None and len(ids) != new.shape[0]:
            raise ValueError("len(ids) must equal the number of new rows")
        if new.shape[1] != self.dim:
            raise ValueError(
                f"new embeddings must be {self.dim}-dim, got {new.shape[1]}")
        start = self._host_emb.shape[0]
        # host concatenate BEFORE mutating labels/ids: a failure here
        # must not leave metadata misaligned with the rows
        self._host_emb = np.concatenate([self._host_emb, new], axis=0)
        if labels is not None:
            self.labels.extend(labels)
        if ids is not None:
            self.ids.extend(ids)
        total_padded = self.shard_size * self.mesh.shape[DATA_AXIS]
        if start + new.shape[0] <= total_padded:
            # fits in reserved capacity: in-place sharded row update,
            # no re-upload, no recompiles
            if self.db_scales is not None:
                q8, scales = quantize_rows_int8(new)
                self.db = _update_rows(self.db, jnp.asarray(q8),
                                       jnp.int32(start))
                self.db_scales = _update_rows_1d(
                    self.db_scales, jnp.asarray(scales), jnp.int32(start))
            else:
                self.db = _update_rows(
                    self.db, jnp.asarray(new, dtype=self.db.dtype),
                    jnp.int32(start))
            self.n = start + new.shape[0]
        else:
            if self.capacity is not None:
                # serving mode: grow geometrically so repeated appends
                # amortize to O(1) rebuilds instead of one per batch
                self.capacity = max(start + new.shape[0],
                                    2 * self.capacity)
            self._upload()  # shape changed; kernels recompile lazily

    def save(self, path) -> None:
        """Persist to npz (embeddings pre-normalized as stored)."""
        payload = {"embeddings": self._host_emb,
                   "n": np.asarray(self.n)}
        if self.labels is not None:
            payload["labels"] = np.asarray(self.labels, dtype=object)
        if self.ids is not None:
            payload["ids"] = np.asarray(self.ids, dtype=object)
        np.savez_compressed(path, **payload)

    @classmethod
    def load(cls, path, mesh: Optional[Mesh] = None,
             dtype: jnp.dtype = jnp.float32,
             use_pallas: bool = False,
             capacity: Optional[int] = None) -> "ShardedEmbeddingDatabase":
        data = np.load(path, allow_pickle=True)
        labels = [str(x) for x in data["labels"]] if "labels" in data else None
        ids = [str(x) for x in data["ids"]] if "ids" in data else None
        return cls(data["embeddings"], labels=labels, ids=ids, mesh=mesh,
                   normalize=False,  # stored pre-normalized
                   dtype=dtype, use_pallas=use_pallas, capacity=capacity)

    def search(self, queries: np.ndarray, k: int, normalize: bool = True
               ) -> List[List[dict]]:
        """Host-friendly search returning per-query neighbor dicts."""
        k = min(k, self.n)
        vals, idx = self.topk(queries, k, normalize=normalize)
        vals = np.asarray(vals)
        idx = np.asarray(idx)
        out = []
        for qi in range(vals.shape[0]):
            hits = []
            for j in range(k):
                i = int(idx[qi, j])
                hit = {"index": i, "score": float(vals[qi, j])}
                if self.labels is not None:
                    hit["label"] = self.labels[i]
                if self.ids is not None:
                    hit["patient_id"] = self.ids[i]
                hits.append(hit)
            out.append(hits)
        return out


if __name__ == "__main__":  # python -m emr2a_tpu.retrieval.database
    from emr2a_tpu.retrieval.database_cli import main
    main()
