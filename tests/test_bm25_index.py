"""Persisted BM25 index: build/query vs the in-memory twin."""
from __future__ import annotations

import glob
import os
import tempfile

import pyarrow as pa
import pytest


def test_bm25_index_matches_inmemory(ray_session, sf_dir):
    """query_bm25_index == the bm25_topk in-memory plan, score-exact,
    including ranks and tie-breaks."""
    import ray.data

    from pdf_extractor_ray.functions.bm25_index import (
        build_bm25_index,
        query_bm25_index,
    )
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", os.path.join(os.path.dirname(__file__), "..",
                                  "__ray_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    d = tempfile.mkdtemp(prefix="bm25test-")
    meta = build_bm25_index(docs, d, num_buckets=32)
    assert meta["n_docs"] == docs.count()
    persisted = [(r["doc_id"], r["score"]) for r in
                 query_bm25_index(["batch", "join", "scan"], d,
                                  k=10).take_all()]
    inmem = [(r["doc_id"], r["score"]) for r in
             entry.queries()["bm25_topk"](sf_dir).take_all()]
    assert persisted == inmem
    assert len(persisted) == 10


def test_bm25_index_reads_only_term_buckets(ray_session):
    """The postings layout really buckets by token: a single-term
    query's candidate set comes from one bucket dir, and an absent
    term returns empty without error."""
    import ray.data

    from pdf_extractor_ray.functions.bm25_index import (
        build_bm25_index,
        query_bm25_index,
    )

    docs = ray.data.from_items([
        {"doc_id": 1, "text": "alpha beta gamma"},
        {"doc_id": 2, "text": "alpha alpha delta"},
        {"doc_id": 3, "text": "epsilon zeta"},
    ])
    d = tempfile.mkdtemp(prefix="bm25small-")
    build_bm25_index(docs, d, num_buckets=8)
    got = {r["doc_id"]: r["score"]
           for r in query_bm25_index(["alpha"], d, k=10).take_all()}
    assert set(got) == {1, 2}
    assert got[2] > got[1]  # tf=2 beats tf=1 at equal length
    none = query_bm25_index(["nosuchtoken"], d, k=10).take_all()
    assert none == []
    # layout sanity: every postings row lives under a bucket dir
    parts = glob.glob(os.path.join(d, "postings", "bucket=*",
                                   "*.parquet"))
    assert parts


def test_rrf_fusion_semantics(ray_session, sf_dir):
    """RRF: a doc high in both runs outranks a doc high in only one;
    scores equal the hand formula over the two run rankings."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "entry_mod2", os.path.join(os.path.dirname(__file__), "..",
                                   "__ray_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    q = entry.queries()

    bm = [r["doc_id"] for r in entry._run_bm25(sf_dir, limit=100).take_all()]
    ql = [r["doc_id"] for r in entry._run_ql(sf_dir, limit=100).take_all()]
    expect = {}
    for run in (bm, ql):
        for rank, d in enumerate(run, start=1):
            expect[d] = expect.get(d, 0.0) + 1.0 / (60.0 + rank)
    top = sorted(expect.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:10]

    got = [(r["doc_id"], r["rrf"])
           for r in q["rrf_fusion_topk"](sf_dir).to_pylist()]
    assert got == [(d, round(v, 9)) for d, v in top]
    assert len(got) == 10
