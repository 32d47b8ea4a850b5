"""Distributed k-means IVF: determinism and recall vs the exact baseline."""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _emb_ds(n=400, dim=16, seed=11):
    import ray.data

    rng = np.random.RandomState(seed)
    # clustered data so IVF recall is meaningful
    centers = rng.randn(8, dim) * 3
    vecs = centers[rng.randint(0, 8, n)] + rng.randn(n, dim) * 0.3
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
        }
    )
    return ray.data.from_arrow(t), vecs


def test_kmeans_deterministic(ray_session):
    from pdf_extractor_ray.functions.similarity import kmeans_fit

    ds, _ = _emb_ds()
    c1 = kmeans_fit(ds, k=8, iters=3)
    c2 = kmeans_fit(ds, k=8, iters=3)
    assert np.array_equal(c1, c2)
    # centroids are unit-norm (spherical k-means)
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, rtol=1e-9)


def test_ivf_kmeans_recall_vs_exact(ray_session):
    from pdf_extractor_ray.functions.similarity import ann_topk, ivf_kmeans_topk

    ds, vecs = _emb_ds()
    queries = vecs[:3]
    exact = ann_topk(ds, queries, k=10, query_ids=[0, 1, 2]).to_pandas()
    approx = ivf_kmeans_topk(
        ds, queries, k=10, n_clusters=8, nprobe=3, query_ids=[0, 1, 2]
    ).to_pandas()
    recalls = []
    for qid in (0, 1, 2):
        want = set(exact[exact.query_id == qid]["vec_id"])
        got = set(approx[approx.query_id == qid]["vec_id"])
        recalls.append(len(want & got) / len(want))
    assert np.mean(recalls) >= 0.8  # nprobe=3/8 on clustered data
