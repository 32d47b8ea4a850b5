"""Persisted-IVF-index ANN: exact parity with the in-memory path."""
from __future__ import annotations

import tempfile

import numpy as np
import pyarrow as pa

from pdf_extractor_ray.functions.ann_index import (build_ivf_index,
                                                   query_ivf_index)
from pdf_extractor_ray.functions.similarity import ivf_kmeans_topk


def _emb(n=120, dim=16, seed=7):
    import ray.data

    rng = np.random.RandomState(seed)
    m = rng.randn(n, dim)
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in m],
                              pa.list_(pa.float64())),
    })), m


def test_persisted_equals_in_memory(ray_session):
    ds, m = _emb()
    q = m[:3]
    idx = tempfile.mkdtemp(prefix="ivfidx-t-")
    meta = build_ivf_index(ds, idx, n_clusters=8, iters=5)
    assert meta["n_vecs"] == 120
    got = query_ivf_index(q, idx, k=5, nprobe=3,
                          query_ids=[0, 1, 2]).to_pandas()
    want = ivf_kmeans_topk(ds, q, k=5, n_clusters=8, nprobe=3,
                           query_ids=[0, 1, 2]).to_pandas()
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got.to_dict("list") == want.to_dict("list")


def test_query_reads_only_probed_buckets(ray_session, tmp_path):
    # with num_buckets == n_clusters and nprobe == 1, the query must
    # self-recover: each query vector is its own nearest stored vector
    ds, m = _emb(n=60, dim=8, seed=11)
    idx = tempfile.mkdtemp(prefix="ivfidx-t-")
    build_ivf_index(ds, idx, n_clusters=6, iters=5)
    got = query_ivf_index(m[:4], idx, k=1, nprobe=1,
                          query_ids=[0, 1, 2, 3]).to_pandas()
    assert sorted(got.vec_id.tolist()) == [0, 1, 2, 3]
    assert (got["rank"] == 1).all()
