"""Persisted-LSH-index incremental near-dup detection."""
from __future__ import annotations

import tempfile

import pyarrow as pa

from pdf_extractor_ray.functions.dedup import _word_shingles, jaccard
from pdf_extractor_ray.functions.lsh_index import (build_lsh_index,
                                                   query_lsh_index)

def _docs(rows):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def _corpus():
    # per-doc disjoint vocabularies: cross-doc jaccard is 0, planted
    # near-copies sit at j ≈ 0.88 (one word of 25 changed) — the
    # regime the recall-1.0 contract covers (at j barely above the
    # 0.5 threshold LSH recall is probabilistic by design)
    old = [(i, " ".join(f"w{i}x{j}" for j in range(25)))
           for i in range(1, 40)]
    new = [(100 + j, old[j][1].replace(f"w{j + 1}x7", "CHANGED"))
           for j in range(3)]
    new += [(200 + j, " ".join(f"fresh{j}y{t}" for t in range(20)))
            for j in range(3)]
    return old, new


def test_incremental_query_matches_exact(ray_session):
    old, new = _corpus()
    idx = tempfile.mkdtemp(prefix="lshidx-t-")
    meta = build_lsh_index(_docs(old), idx)
    assert meta["n_docs"] == len(old)
    got = sorted(
        (int(r["new_doc_id"]), int(r["old_doc_id"]))
        for r in query_lsh_index(_docs(new), idx, threshold=0.5).iter_rows()
    )
    sh_old = {d: _word_shingles(t) for d, t in old}
    sh_new = {d: _word_shingles(t) for d, t in new}
    want = sorted(
        (n, o) for n in sh_new for o in sh_old
        if jaccard(sh_new[n], sh_old[o]) >= 0.5
    )
    assert got == want
    assert len(got) >= 3  # the planted near-copies are found
    planted = {(100 + j, 1 + j) for j in range(3)}
    assert planted <= set(got)


def test_incremental_query_no_candidates_is_typed_empty(ray_session):
    old, _ = _corpus()
    idx = tempfile.mkdtemp(prefix="lshidx-t-")
    build_lsh_index(_docs(old), idx)
    fresh = _docs([(900, "entirely disjoint vocabulary nine hundred")])
    out = query_lsh_index(fresh, idx)
    assert out.count() == 0
    assert set(out.schema().names) == {"new_doc_id", "old_doc_id", "jaccard"}


def test_append_then_next_batch_dedups_against_appended(ray_session):
    from pdf_extractor_ray.functions.lsh_index import append_lsh_index

    old, _ = _corpus()
    idx = tempfile.mkdtemp(prefix="lshidx-t-")
    m0 = build_lsh_index(_docs(old), idx)
    batch_b = [(500, " ".join(f"b500w{t}" for t in range(25)))]
    m1 = append_lsh_index(_docs(batch_b), idx)
    assert m1["n_docs"] == m0["n_docs"] + 1
    # batch C near-dups the APPENDED doc (one word changed) and an
    # ORIGINAL doc — both must be found by the same query
    batch_c = [(600, batch_b[0][1].replace("b500w3", "CHANGED")),
               (601, old[5][1].replace(f"w6x9", "CHANGED"))]
    got = sorted(
        (int(r["new_doc_id"]), int(r["old_doc_id"]))
        for r in query_lsh_index(_docs(batch_c), idx,
                                 threshold=0.5).iter_rows()
    )
    assert got == [(600, 500), (601, 6)]
