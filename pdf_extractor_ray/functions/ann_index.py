"""Persisted IVF (inverted-file) ANN index — the embedding-modality
sibling of :mod:`lsh_index`.

A 100-TB embedding store is indexed ONCE: the sample-fit k-means
coarse quantizer (:func:`similarity.kmeans_fit`) assigns every vector
to a cluster, and the (cluster, vec_id, embedding) rows are written as
bucketed co-partitioned parquet keyed by cluster id.  Every later
query batch then touches ONLY the bucket dirs that hold its probed
clusters — no quantizer refit, no full-corpus scan, no exchange.

Query semantics are IDENTICAL to :func:`similarity.ivf_kmeans_topk`
(same fit, same union-of-probes candidate set, same exact-cosine
rank/tiebreak finish), so the persisted path is pinned against the
in-memory path exactly, and the unrolled-Lloyd SQL oracle
(``_ivf_kmeans_sql``) verifies it end-to-end.
"""
from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa

from .bucketed import write_bucketed
from .joins import _bucket_of
from .similarity import _finish_topk, _matrix, _normalize, kmeans_fit


def build_ivf_index(emb_ds, index_dir: str, *, n_clusters: int = 16,
                    iters: int = 5, num_buckets: int = 0) -> dict:
    """Fit the coarse quantizer and write the inverted file.  Two
    passes (quantizer sample + assignment write, both streaming);
    centroids land in ``meta.json`` as exact round-trip float
    literals.  ``num_buckets`` defaults to ``n_clusters`` (each bucket
    dir then holds whole clusters, hashed — multiple clusters may
    share a dir; the query filters rows by assigned cluster after the
    pruned read)."""
    import ray

    nb = num_buckets or n_clusters
    cents = kmeans_fit(emb_ds, k=n_clusters, iters=iters)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        m = _matrix(batch.column("embedding"))
        cl = (
            pa.array([], pa.int64()) if m.size == 0
            else pa.array(np.argmax(_normalize(m) @ c.T, axis=1)
                          .astype(np.int64))
        )
        return pa.table({
            "cluster": cl,
            "vec_id": batch.column("vec_id"),
            "embedding": batch.column("embedding"),
        })

    assigned = emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow"
    )
    n_vecs = sum(
        r["n_rows"] for r in write_bucketed(
            assigned, "cluster", os.path.join(index_dir, "vectors"), nb,
        ).iter_rows()
    )
    meta = {"n_clusters": n_clusters, "iters": iters, "num_buckets": nb,
            "n_vecs": n_vecs,
            "centroids": [[repr(float(x)) for x in row] for row in cents]}
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))
    return meta


def query_ivf_index(query_vecs: np.ndarray, index_dir: str, *, k: int = 10,
                    nprobe: int = 4, query_ids=None):
    """Top-k nearest stored vectors per query, reading ONLY the bucket
    dirs of the probed clusters.  Matches ``ivf_kmeans_topk`` exactly:
    probe set = union of each query's ``nprobe`` nearest centroids,
    candidates ranked by exact cosine with the ``ann_topk``
    rank/tiebreak recipe."""
    import ray
    import ray.data

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    cents = np.asarray(
        [[float(x) for x in row] for row in meta["centroids"]], np.float64
    )
    nb = meta["num_buckets"]
    q = _normalize(np.asarray(query_vecs, np.float64))
    if query_ids is None:
        query_ids = list(range(len(q)))
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    probe_set = sorted({int(c) for row in probe for c in row})
    probe_buckets = sorted({
        int(b) for b in _bucket_of(
            pa.chunked_array([pa.array(probe_set, pa.int64())]), nb
        ).to_pylist()
    })
    paths = [
        p for i in probe_buckets
        for p in sorted(glob.glob(os.path.join(
            index_dir, "vectors", f"bucket={i}", "part-*.parquet")))
    ]
    probe_ref = ray.put(np.asarray(probe_set, np.int64))
    qs_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        keep = ray.get(probe_ref)
        mask = np.isin(
            batch.column("cluster").to_numpy(zero_copy_only=False), keep
        )
        cand = batch.filter(pa.array(mask))
        qv = ray.get(qs_ref)
        out = {
            "query_id": [], "vec_id": [], "sim": [],
        }
        m = _matrix(cand.column("embedding"))
        if m.size:
            # same matmul orientation as ann_topk's local stage, so the
            # persisted path is bit-identical to ivf_kmeans_topk
            sims = _normalize(m) @ qv.T  # (n, nq)
            vids = cand.column("vec_id").to_numpy(zero_copy_only=False)
            for qi in range(qv.shape[0]):
                col = sims[:, qi]
                take = min(k, len(col))
                idx = np.argpartition(-col, take - 1)[:take]
                out["query_id"].extend([qi] * take)
                out["vec_id"].extend(int(vids[i]) for i in idx)
                out["sim"].extend(float(col[i]) for i in idx)
        return pa.table({
            "query_id": pa.array(out["query_id"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "sim": pa.array(out["sim"], pa.float64()),
        })

    local = ray.data.read_parquet(paths).map_batches(
        local_topk, batch_format="pyarrow",
    )
    return _finish_topk(local, k, query_ids)
