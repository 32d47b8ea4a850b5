"""DSIR importance resampling: enrichment, determinism, edge cases."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _word(rng, vocab):
    return vocab[rng.randint(0, len(vocab))]


def _doc(rng, vocab, n_words=40):
    return " ".join(_word(rng, vocab) for _ in range(n_words))


VOCAB_A = ["stein", "berg", "wald", "fluss", "himmel", "zeit", "nacht"]
VOCAB_B = ["ocean", "jump", "quick", "pixel", "vortex", "glyph", "crux"]


def _corpus():
    rng = np.random.RandomState(11)
    texts, pops = [], []
    for i in range(200):
        if i % 2 == 0:
            texts.append(_doc(rng, VOCAB_A))
            pops.append("A")
        else:
            texts.append(_doc(rng, VOCAB_B))
            pops.append("B")
    return pa.table({
        "doc_id": pa.array(list(range(200)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "pop": pa.array(pops, pa.string()),
    })


def test_dsir_select_enriches_target_population(ray_session):
    import ray.data

    from pdf_extractor_ray.functions.dsir import dsir_select

    corpus = _corpus()
    source = ray.data.from_arrow(corpus)
    # target: a small probe of population A only
    target = ray.data.from_arrow(corpus.filter(
        pa.compute.and_(pa.compute.equal(corpus.column("pop"), "A"),
                        pa.compute.less(corpus.column("doc_id"), 20))))
    picked = dsir_select(source, target, n=40).to_pandas()
    assert picked.shape[0] == 40
    frac_a = (picked["pop"] == "A").mean()
    assert frac_a >= 0.9, frac_a  # corpus is 50/50 — selection must skew
    # weights separate the populations
    wa = picked.loc[picked["pop"] == "A", "dsir_logw"]
    if (picked["pop"] == "B").any():
        wb = picked.loc[picked["pop"] == "B", "dsir_logw"]
        assert wa.min() > wb.max()


def test_dsir_select_is_deterministic(ray_session):
    import ray.data

    from pdf_extractor_ray.functions.dsir import dsir_select

    corpus = _corpus()
    source = ray.data.from_arrow(corpus)
    target = ray.data.from_arrow(corpus.slice(0, 30))
    a = sorted(dsir_select(source, target, n=25).to_pandas()["doc_id"])
    b = sorted(dsir_select(source, target, n=25).to_pandas()["doc_id"])
    assert a == b


def test_dsir_weights_empty_doc_never_wins(ray_session):
    import ray.data

    from pdf_extractor_ray.functions.dsir import (dsir_weights,
                                                  fit_feature_counts,
                                                  log_importance_ratio)

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["stein berg wald", ""], pa.string()),
    })
    ds = ray.data.from_arrow(t)
    counts = fit_feature_counts(ds)
    lr = log_importance_ratio(counts, counts)
    out = dsir_weights(ds, lr).to_pandas().set_index("doc_id")
    assert out.loc[2, "dsir_logw"] == -np.inf
    # identical target/source distributions → mean log-ratio ≈ 0
    assert abs(out.loc[1, "dsir_logw"]) < 1e-9


def test_gumbel_scale_zero_is_hard_topn(ray_session):
    import ray.data

    from pdf_extractor_ray.functions.dsir import dsir_select, dsir_weights, \
        fit_feature_counts, log_importance_ratio

    corpus = _corpus()
    source = ray.data.from_arrow(corpus)
    target = ray.data.from_arrow(corpus.filter(
        pa.compute.equal(corpus.column("pop"), "A")))
    picked = dsir_select(source, target, n=10, gumbel_scale=0.0).to_pandas()
    # hard top-n by weight: every winner must be population A
    assert (picked["pop"] == "A").all()
    tgt = fit_feature_counts(target)
    src = fit_feature_counts(source)
    lr = log_importance_ratio(tgt, src)
    allw = dsir_weights(source, lr).to_pandas()
    top10 = set(allw.sort_values(
        ["dsir_logw", "doc_id"], ascending=[False, True]).head(10)["doc_id"])
    assert set(picked["doc_id"]) == top10
