"""Similarity search over an embedding column (list<float>).

- ``ann_topk``: brute-force cosine top-k per batch against a BROADCAST
  query matrix (``ray.put`` once, numpy matmul per batch) → per-batch
  local top-k → tiny global merge.  The baseline that always works.
- ``embedding_near_dups``: all-pairs cosine ≥ threshold via the same
  broadcast pattern (small-side fits memory at correctness scale; at
  100 TB swap the broadcast side for an IVF index, same stage shape).
- ``ivf_topk``: LSH/IVF-bucketed variant — the scale path: random
  hyperplane buckets, search only matching buckets.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa


def _matrix(batch_col) -> np.ndarray:
    arr = np.asarray(batch_col.to_pylist(), dtype=np.float64)
    if arr.ndim == 1:  # empty batch
        arr = arr.reshape(0, 0)
    return arr


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def ann_topk(emb_ds, query_vecs: np.ndarray, k: int = 10, query_ids: Optional[List[int]] = None):
    """Embeddings Dataset → top-k (query_id, vec_id, sim_rounded, rank).

    Per-batch brute force against the broadcast query matrix, local
    top-k per batch, global merge on the driver (k × n_queries rows —
    tiny).  sim is rounded for stable comparison.  ``query_ids`` maps
    matrix row index → reported query_id.
    """
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_ref = ray.put(q)
    if query_ids is None:
        query_ids = list(range(len(q)))

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        vec_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = _matrix(batch.column("embedding"))
        if m.size == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        sims = _normalize(m) @ qm.T  # (batch, n_queries)
        out_q, out_v, out_s = [], [], []
        for qi in range(qm.shape[0]):
            col = sims[:, qi]
            take = min(k, len(col))
            idx = np.argpartition(-col, take - 1)[:take]
            for i in idx:
                out_q.append(qi)
                out_v.append(int(vec_ids[i]))
                out_s.append(float(col[i]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    local = emb_ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    # global merge: per query, best k by (sim desc, vec_id asc)
    rows = sorted(local, key=lambda r: (r["query_id"], -r["sim"], r["vec_id"]))
    out_rows = []
    per_q = 0
    last_q: Optional[int] = None
    for r in rows:
        if r["query_id"] != last_q:
            last_q, per_q = r["query_id"], 0
        if per_q < k:
            out_rows.append(
                {
                    "query_id": query_ids[r["query_id"]],
                    "vec_id": r["vec_id"],
                    "sim": round(r["sim"], 4),
                    "rank": per_q + 1,
                }
            )
            per_q += 1
    return pa.Table.from_pylist(
        out_rows,
        schema=pa.schema(
            [
                ("query_id", pa.int64()),
                ("vec_id", pa.int64()),
                ("sim", pa.float64()),
                ("rank", pa.int64()),
            ]
        ),
    )


def embedding_near_dups(emb_ds, threshold: float = 0.95):
    """All-pairs cosine ≥ threshold → (vec_a < vec_b) pairs.

    The full matrix is broadcast once (``ray.put``) and each batch
    compares only its own rows against rows with larger vec_id —
    work-partitioned all-pairs without a shuffle.
    """
    import ray

    rows = emb_ds.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    mat = _normalize(np.asarray([r["embedding"] for r in rows], dtype=np.float64))
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    ref = ray.put((ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        my_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        pos = np.searchsorted(all_ids, my_ids)
        a_out, b_out, s_out = [], [], []
        for p, a in zip(pos, my_ids):
            if p + 1 >= len(all_ids):
                continue
            sims = all_mat[p + 1 :] @ all_mat[p]
            hits = np.nonzero(sims >= threshold)[0]
            for h in hits:
                a_out.append(int(a))
                b_out.append(int(all_ids[p + 1 + h]))
                s_out.append(round(float(sims[h]), 6))
        return pa.table(
            {
                "vec_a": pa.array(a_out, pa.int64()),
                "vec_b": pa.array(b_out, pa.int64()),
                "sim": pa.array(s_out, pa.float64()),
            }
        )

    return emb_ds.select_columns(["vec_id"]).map_batches(pairs, batch_format="pyarrow")


def kmeans_fit(emb_ds, k: int = 16, iters: int = 5):
    """Distributed spherical k-means over the embedding column.

    Lloyd iterations as partial aggregation: each batch computes
    per-centroid (vector-sum, count) partials — a k×dim matrix per
    block, NOT per row — merged on the driver; only centroids travel.
    Deterministic: init = the k lowest-vec_id embeddings, fixed
    iteration count, argmax ties broken by lowest centroid index.
    """
    import ray

    init_rows = sorted(
        emb_ds.select_columns(["vec_id", "embedding"]).take(k * 4),
        key=lambda r: r["vec_id"],
    )[:k]
    cents = _normalize(np.asarray([r["embedding"] for r in init_rows], np.float64))

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _matrix(batch.column("embedding"))
            if m.size == 0:
                sums = np.zeros_like(c)
                counts = np.zeros(len(c), np.int64)
            else:
                mn = _normalize(m)
                assign = np.argmax(mn @ c.T, axis=1)
                sums = np.zeros_like(c)
                np.add.at(sums, assign, mn)
                counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
            return pa.table(
                {
                    "sums": pa.array([sums.tobytes()], pa.binary()),
                    "counts": pa.array([counts.tobytes()], pa.binary()),
                }
            )

        parts = [
            ray.get(r)
            for r in emb_ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        ]
        tot_sum = np.zeros_like(cents)
        tot_cnt = np.zeros(len(cents), np.int64)
        for t in parts:
            for sb, cb in zip(t.column("sums").to_pylist(), t.column("counts").to_pylist()):
                tot_sum += np.frombuffer(sb, np.float64).reshape(cents.shape)
                tot_cnt += np.frombuffer(cb, np.int64)
        nonempty = tot_cnt > 0
        cents[nonempty] = _normalize(tot_sum[nonempty] / tot_cnt[nonempty, None])
    return cents


def ivf_kmeans_topk(emb_ds, query_vecs: np.ndarray, k: int = 10,
                    n_clusters: int = 16, nprobe: int = 4, iters: int = 5,
                    query_ids=None):
    """True IVF ANN: k-means coarse quantizer, search only the nprobe
    clusters nearest each query. Approximate (recall < 1); exact
    baseline is ``ann_topk``; the cheap alternative quantizer is
    ``ivf_topk`` (hyperplane LSH)."""
    import ray

    cents = kmeans_fit(emb_ds, k=n_clusters, iters=iters)
    q = _normalize(np.asarray(query_vecs, np.float64))
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    probe_set = sorted({int(c) for row in probe for c in row})
    cents_ref = ray.put((cents, np.asarray(probe_set, np.int64)))

    def in_probed(batch: pa.Table) -> pa.Table:
        c, keep = ray.get(cents_ref)
        m = _matrix(batch.column("embedding"))
        if m.size == 0:
            return batch
        assign = np.argmax(_normalize(m) @ c.T, axis=1)
        mask = np.isin(assign, keep)
        return batch.filter(pa.array(mask))

    candidates = emb_ds.map_batches(in_probed, batch_format="pyarrow")
    return ann_topk(candidates, query_vecs, k, query_ids=query_ids)


class HyperplaneBucketStage:
    """vec → LSH bucket id from sign bits of random hyperplane dots."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 42) -> None:
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(n_planes, dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch.column("embedding"))
        if m.size == 0:
            bucket = pa.array([], pa.int32())
        else:
            bits = (m @ self.planes.T) > 0
            bucket = pa.array(
                (bits @ (1 << np.arange(bits.shape[1]))).astype(np.int32)
            )
        return batch.append_column("bucket", bucket)


def ivf_topk(emb_ds, query_vecs: np.ndarray, k: int = 10, n_planes: int = 8, dim: int = 0):
    """Scale path: bucket the corpus by hyperplane LSH, search only the
    buckets the queries land in.  Approximate (recall < 1); the exact
    baseline is ``ann_topk``."""
    if dim == 0:
        first = emb_ds.take(1)
        dim = len(first[0]["embedding"])
    stage = HyperplaneBucketStage(dim, n_planes)
    q = np.asarray(query_vecs, dtype=np.float64)
    q_bits = (q @ stage.planes.T) > 0
    q_buckets = set((q_bits @ (1 << np.arange(q_bits.shape[1]))).astype(int).tolist())
    bucketed = emb_ds.map_batches(
        HyperplaneBucketStage,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    candidates = bucketed.filter(
        expr=f"bucket in {sorted(q_buckets)}" if len(q_buckets) > 1
        else f"bucket == {next(iter(q_buckets))}"
    )
    return ann_topk(candidates, query_vecs, k)
