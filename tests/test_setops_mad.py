"""Whole-row INTERSECT/EXCEPT set ops and grouped median/MAD."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from pdf_extractor_ray.functions.setops import except_distinct, intersect_distinct


def _pairs(rows):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "t": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_intersect_distinct_dedups_and_matches(ray_session):
    a = _pairs([(1, "x"), (1, "x"), (2, "y"), (3, "z")])
    b = _pairs([(1, "x"), (3, "z"), (3, "z"), (4, "w")])
    out = sorted(
        map(tuple, intersect_distinct(a, b, ["u", "t"])
            .to_pandas()[["u", "t"]].itertuples(index=False))
    )
    assert out == [(1, "x"), (3, "z")]


def test_except_distinct(ray_session):
    a = _pairs([(1, "x"), (2, "y"), (2, "y"), (3, "z")])
    b = _pairs([(2, "y")])
    out = sorted(
        map(tuple, except_distinct(a, b, ["u", "t"])
            .to_pandas()[["u", "t"]].itertuples(index=False))
    )
    assert out == [(1, "x"), (3, "z")]


def test_setops_no_cross_column_confusion(ray_session):
    # ("a:b","c") must not digest-collide with ("a","b:c") or with a
    # None vs "None" confusion
    a = _pairs([(1, "x")])
    import ray.data

    b = ray.data.from_arrow(pa.table({
        "u": pa.array([1], pa.int64()),
        "t": pa.array([None], pa.string()),
    }))
    assert intersect_distinct(a, b, ["u", "t"]).count() == 0
    assert except_distinct(a, b, ["u", "t"]).count() == 1


def test_mad_by_matches_numpy(ray_session):
    import ray.data

    from pdf_extractor_ray.functions.agg import mad_by

    rng = {"en": [10, 20, 30, 40, 1000], "de": [5, 5, 9, 9]}
    rows_k, rows_v = [], []
    for k, vs in rng.items():
        rows_k += [k] * len(vs)
        rows_v += vs
    ds = ray.data.from_arrow(pa.table({
        "lang": pa.array(rows_k, pa.string()),
        "n": pa.array(rows_v, pa.int64()),
    }))
    out = mad_by(ds, "lang", "n").to_pandas().set_index("lang")
    for k, vs in rng.items():
        med = np.quantile(np.asarray(vs, float), 0.5)
        mad = np.quantile(np.abs(np.asarray(vs, float) - med), 0.5)
        assert out.loc[k, "median_n"] == pytest.approx(med, abs=1e-6)
        assert out.loc[k, "mad_n"] == pytest.approx(mad, abs=1e-6)
    # the 1000 outlier must not drag MAD the way it drags stddev
    assert out.loc["en", "mad_n"] <= 20
