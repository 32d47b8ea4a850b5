"""Corpus-mixture operators: split_assign, rebalance_equal,
percentile_keep, snapshot_diff, char_entropy."""
from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pytest

from pdf_extractor_ray.functions.mix import (
    global_quantile_cont,
    percentile_keep,
    rebalance_equal,
    snapshot_diff,
    split_assign,
    split_thresholds,
)


def _docs_ds(n=200):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "lang": pa.array([("en", "de", "fr")[i % 7 % 3] for i in range(n)]),
        "n_chars": pa.array([50 + (i * 37) % 400 for i in range(n)],
                            pa.int64()),
    }))


# ------------------------------------------------------------- split_assign
def test_split_thresholds_are_exact_monotone_ints():
    bands = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    names = [n for n, _ in bands]
    thrs = [t for _, t in bands]
    assert names == ["train", "val", "test"]
    assert thrs[-1] == 1 << 52
    assert thrs == sorted(thrs)
    assert all(isinstance(t, int) for t in thrs)


def test_split_thresholds_rejects_zero_total():
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.0})


def test_split_assign_matches_manual_md5_and_is_growth_stable(ray_session):
    out = (
        split_assign(_docs_ds(200), "doc_id",
                     {"train": 0.8, "val": 0.1, "test": 0.1})
        .to_pandas().set_index("doc_id")["split"]
    )
    bands = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    for doc_id in (0, 7, 123, 199):
        u = int(hashlib.md5(f":{doc_id}".encode()).hexdigest()[:13], 16)
        want = next(n for n, t in bands if u < t)
        assert out[doc_id] == want
    # growth stability: the same keys get the same split in a bigger corpus
    bigger = (
        split_assign(_docs_ds(400), "doc_id",
                     {"train": 0.8, "val": 0.1, "test": 0.1})
        .to_pandas().set_index("doc_id")["split"]
    )
    assert (bigger.loc[out.index] == out).all()
    # fractions roughly respected
    frac = (out == "train").mean()
    assert 0.7 < frac < 0.9


# --------------------------------------------------------- rebalance_equal
def test_rebalance_equal_downsamples_to_min_group(ray_session):
    df = rebalance_equal(_docs_ds(200), "lang", "doc_id").to_pandas()
    sizes = df.groupby("lang").size()
    src = _docs_ds(200).to_pandas().groupby("lang").size()
    assert set(sizes.index) == set(src.index)
    assert (sizes == src.min()).all()
    # deterministic choice: first-n by (md5(doc_id), doc_id) within group
    src_df = _docs_ds(200).to_pandas()
    for lang, grp in src_df.groupby("lang"):
        ranked = sorted(
            grp["doc_id"],
            key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d),
        )[: int(src.min())]
        assert set(df[df["lang"] == lang]["doc_id"]) == set(ranked)


def test_rebalance_equal_empty_input(ray_session):
    import ray.data

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "lang": pa.array([], pa.string()),
    }))
    assert rebalance_equal(empty, "lang", "doc_id").count() == 0


# --------------------------------------------------------- percentile_keep
def test_global_quantile_matches_numpy_type7(ray_session):
    vals = np.asarray([50 + (i * 37) % 400 for i in range(200)])
    got = global_quantile_cont(_docs_ds(200), "n_chars", 0.25)
    want = float(np.quantile(vals, 0.25))  # numpy linear == type 7
    assert got == pytest.approx(want, abs=1e-6)


def test_percentile_keep_upper_and_lower(ray_session):
    kept, thr = percentile_keep(_docs_ds(200), "n_chars", 0.25, keep="upper")
    df = kept.to_pandas()
    assert (df["n_chars"] >= thr).all()
    vals = _docs_ds(200).to_pandas()["n_chars"]
    assert len(df) == int((vals >= thr).sum())
    low, thr2 = percentile_keep(_docs_ds(200), "n_chars", 0.25, keep="lower")
    assert (low.to_pandas()["n_chars"] <= thr2).all()


# ----------------------------------------------------------- snapshot_diff
def _snap(rows):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "h": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_snapshot_diff_all_four_statuses(ray_session):
    old = _snap([("a", "1"), ("b", "2"), ("c", "3")])
    new = _snap([("b", "2"), ("c", "9"), ("d", "4")])
    df = (
        snapshot_diff(old, new, "url", "h")
        .to_pandas().set_index("url").sort_index()
    )
    assert df.loc["a", "status"] == "removed"
    assert df.loc["b", "status"] == "same"
    assert df.loc["c", "status"] == "changed"
    assert df.loc["d", "status"] == "added"
    assert df.loc["c", "old_h"] == "3" and df.loc["c", "new_h"] == "9"
    import pandas as pd

    assert pd.isna(df.loc["a", "new_h"]) and pd.isna(df.loc["d", "old_h"])
    assert len(df) == 4


def test_snapshot_diff_duplicate_key_raises(ray_session):
    import ray.exceptions

    old = _snap([("a", "1"), ("a", "2")])
    new = _snap([("a", "1")])
    with pytest.raises(Exception, match="duplicated within one snapshot"):
        snapshot_diff(old, new, "url", "h").to_pandas()


def test_snapshot_diff_int_keys_and_float_values(ray_session):
    import ray.data

    def snap(rows):
        return ray.data.from_arrow(pa.table({
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "v": pa.array([r[1] for r in rows], pa.float64()),
        }))

    df = (
        snapshot_diff(snap([(1, 1.5), (2, 2.0)]),
                      snap([(1, 1.5), (2, 2.5), (3, 0.0)]), "k", "v")
        .to_pandas().set_index("k").sort_index()
    )
    assert list(df["status"]) == ["same", "changed", "added"]


# ------------------------------------------------------------ char_entropy
def test_char_entropy_known_values():
    from pdf_extractor_ray.functions.text import char_entropy

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["aabb", "abcd", "aaaa", ""]),
    })
    out = char_entropy(batch).to_pandas().set_index("doc_id")["entropy"]
    assert out[1] == pytest.approx(1.0)
    assert out[2] == pytest.approx(2.0)
    assert out[3] == pytest.approx(0.0)
    assert np.isnan(out[4])


def test_char_entropy_non_ascii_fallback_matches_counter():
    from collections import Counter

    from pdf_extractor_ray.functions.text import char_entropy

    texts = ["héllo wörld", "αβγαβ", "data"]
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(texts),
    })
    out = char_entropy(batch).to_pandas().set_index("doc_id")["entropy"]
    for i, t in enumerate(texts, start=1):
        counts = np.asarray(list(Counter(t).values()), dtype=float)
        p = counts / counts.sum()
        want = float(-(p * np.log2(p)).sum())
        assert out[i] == pytest.approx(want, abs=1e-6)


def test_rebalance_weighted_quotas_and_determinism(ray_session):
    from pdf_extractor_ray.functions.mix import rebalance_weighted

    df = rebalance_weighted(
        _docs_ds(200), "lang", "doc_id", {"en": 0.5, "de": 0.5}
    ).to_pandas()
    src = _docs_ds(200).to_pandas()
    cnt = src.groupby("lang").size()
    scale = min(cnt["en"] / 0.5, cnt["de"] / 0.5)
    sizes = df.groupby("lang").size()
    assert set(sizes.index) == {"en", "de"}  # 'fr' dropped (no weight)
    assert sizes["en"] == int(0.5 * scale)
    assert sizes["de"] == int(0.5 * scale)
    # deterministic pick: first-quota by (md5(doc_id), doc_id) in group
    for lang in ("en", "de"):
        grp = src[src["lang"] == lang]["doc_id"]
        ranked = sorted(
            grp, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
        )[: int(sizes[lang])]
        assert set(df[df["lang"] == lang]["doc_id"]) == set(ranked)


def test_rebalance_weighted_rejects_missing_group(ray_session):
    from pdf_extractor_ray.functions.mix import rebalance_weighted

    with pytest.raises(ValueError, match="absent from data"):
        rebalance_weighted(_docs_ds(50), "lang", "doc_id", {"xx": 1.0})
