"""As-of join and HLL sketch: parity with exact references."""
from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ts(day):
    return dt.datetime(2024, 1, day)


def test_asof_join_semantics(ray_session):
    import ray.data

    from pdf_extractor_ray.functions.joins import asof_join

    left = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2, 3], pa.int64()),
        "ts": pa.array([_ts(5), _ts(1), _ts(9), _ts(2)], pa.timestamp("us")),
        "event_id": pa.array([10, 11, 12, 13], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts(1), _ts(4), _ts(4), _ts(20)], pa.timestamp("us")),
        "o_orderkey": pa.array([100, 101, 102, 103], pa.int64()),
    }))

    # harmonize key name: rename right key to user_id
    def rn(b: pa.Table) -> pa.Table:
        return b.rename_columns(["user_id", "o_orderdate", "o_orderkey"])

    df = (
        asof_join(
            left, right.map_batches(rn, batch_format="pyarrow"),
            key="user_id", left_ts="ts", right_ts="o_orderdate",
            right_tiebreak="o_orderkey",
            left_cols=["event_id", "user_id", "ts"],
            right_cols=["o_orderkey"],
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    by_event = dict(zip(df["event_id"], df["o_orderkey"]))
    assert by_event[10] == 102  # ts day5: latest ≤ is day4; tie → max orderkey
    assert by_event[11] == 100  # ts day1: exact-day match allowed
    assert pd.isna(by_event[12])  # user 2's only order is later (day20)
    assert pd.isna(by_event[13])  # user 3 has no orders
    assert len(df) == 4


def test_hll_accuracy(ray_session):
    import ray.data

    from pdf_extractor_ray.functions.sketch import approx_distinct

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 50_000, size=200_000).astype(np.int64)
    exact = len(np.unique(vals))
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    est = approx_distinct(ds, "v", p=12)
    assert abs(est - exact) / exact < 0.05  # p=12 → ~1.6% typical error


def test_hll_merge_associativity():
    from pdf_extractor_ray.functions.sketch import _estimate, _hash64, _registers

    a = np.arange(0, 5000, dtype=np.int64)
    b = np.arange(2500, 8000, dtype=np.int64)
    ra = _registers(_hash64(a), 12)
    rb = _registers(_hash64(b), 12)
    merged = np.maximum(ra, rb)
    whole = _registers(_hash64(np.arange(0, 8000, dtype=np.int64)), 12)
    assert np.array_equal(merged, whole)  # merge == sketch of union
    est = _estimate(merged, 12)
    assert abs(est - 8000) / 8000 < 0.05
