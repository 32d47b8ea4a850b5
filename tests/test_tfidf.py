"""TF-IDF cosine similarity self-join (exact sparse all-pairs)."""
from __future__ import annotations

import collections
import math

import numpy as np
import pyarrow as pa
import pytest

from pdf_extractor_ray.functions.similarity import tfidf_cosine_pairs


def _local_reference(texts, threshold, max_df, ngram=3):
    """From-scratch TF-IDF cosine over shingles, dense numpy."""
    sh = []
    for t in texts:
        ws = t.lower().split()
        c = collections.Counter(
            " ".join(ws[i:i + ngram]) for i in range(len(ws) - ngram + 1)
        )
        sh.append(c)
    df = collections.Counter()
    for c in sh:
        df.update(c.keys())
    vocab = sorted(g for g, d in df.items() if d <= max_df)
    vidx = {g: i for i, g in enumerate(vocab)}
    n = len(texts)
    m = np.zeros((n, len(vocab)))
    for i, c in enumerate(sh):
        for g, tf in c.items():
            j = vidx.get(g)
            if j is not None:
                m[i, j] = tf * math.log(n / df[g])
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sims = (m / norms) @ (m / norms).T
    out = {}
    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] >= threshold:
                out[(i, j)] = sims[i, j]
    return out


def test_tfidf_pairs_match_dense_reference(ray_session):
    import ray.data

    base = ("the quick brown fox jumps over the lazy dog while "
            "seven wizards brew strange potions under pale moonlight")
    texts = [
        base,
        base,  # exact dup of 0
        base + " with an extra tail clause appended here",  # near dup
        "completely different words about ships sailing stormy seas "
        "and captains charting unknown waters by starlight alone",
        "another unrelated document concerning recipes for bread "
        "flour yeast salt water and patient slow fermentation",
    ]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    got = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(
            docs, threshold=0.2, max_df=100
        ).take_all()
    }
    want = _local_reference(texts, 0.2, 100)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-6)
    assert got[(0, 1)] == pytest.approx(1.0)   # exact dup
    # near dup: idf DOWN-weights the shared (df=3) shingles relative to
    # doc 2's unique tail, so the cosine is well under 1 but still found
    assert got[(0, 2)] > 0.3
    assert (0, 3) not in got and (3, 4) not in got


def test_tfidf_max_df_drops_universal_shingles(ray_session):
    import ray.data

    # the same sentence in every doc: with max_df < n_docs every
    # shingle is a stop shingle -> no vector mass -> no pairs; with
    # df == n_docs idf is 0 -> STILL zero mass (universal shingles
    # carry no information — correct TF-IDF semantics, and the SQL
    # twin agrees via NaN norms failing HAVING)
    texts = ["alpha beta gamma delta epsilon zeta"] * 4
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts),
    }))
    assert tfidf_cosine_pairs(docs, threshold=0.1, max_df=3).count() == 0
    assert tfidf_cosine_pairs(docs, threshold=0.1, max_df=4).count() == 0
    # a shingle shared by SOME (not all) docs does produce a pair
    texts2 = ["alpha beta gamma delta", "alpha beta gamma epsilon",
              "zeta eta theta iota"]
    docs2 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts2),
    }))
    got = tfidf_cosine_pairs(docs2, threshold=0.1, max_df=3).take_all()
    assert [(r["doc_a"], r["doc_b"]) for r in got] == [(0, 1)]


def test_tfidf_short_docs_yield_no_shingles(ray_session):
    import ray.data

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["one two", "one two"]),  # < ngram words
    }))
    assert tfidf_cosine_pairs(docs, threshold=0.1, max_df=10).count() == 0


def test_pmi_bigrams_scores_collocations(ray_session):
    import math

    import ray.data

    from pdf_extractor_ray.functions.text import pmi_top_bigrams

    # "strong coffee" always co-occurs; "the cat" shares 'the' with
    # many other pairs -> lower PMI
    texts = (["strong coffee please"] * 4
             + ["the cat sat", "the dog ran", "the bird flew",
                "the cat ran", "the the the the"])
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    out = pmi_top_bigrams(docs, k=10).to_pandas().set_index("ngram")
    # manual PMI for 'strong coffee': c_xy=4, N2=19, c_x=c_y=4, N1=28
    want = math.log((4 / 19) / ((4 / 28) * (4 / 28)))
    assert out.loc["strong coffee", "pmi"] == pytest.approx(want, abs=1e-6)
    assert out.loc["strong coffee", "pmi"] > out.loc["the cat", "pmi"]
    # sorted by pmi desc
    assert list(out["pmi"]) == sorted(out["pmi"], reverse=True)
