"""Property-based join tests: hash/semi/anti/asof joins vs a direct
row-by-row SQL-semantics oracle on random keyed tables (nulls,
duplicate keys, skewed key spaces)."""
from __future__ import annotations

import datetime

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEYS = st.one_of(st.none(), st.integers(min_value=0, max_value=4))
VALS = st.integers(min_value=-100, max_value=100)

LEFT = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=12)
RIGHT = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=12)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _left_table(rows):
    return pa.table(
        {
            "lk": pa.array([r[0] for r in rows], pa.int64()),
            "lv": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def _right_table(rows):
    return pa.table(
        {
            "rk": pa.array([r[0] for r in rows], pa.int64()),
            "rv": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def _ds(t):
    import ray.data

    return ray.data.from_arrow(t)


def _pdf(ds):
    from pdf_extractor_ray.functions.joins import to_pandas_typed

    return to_pandas_typed(ds)


@_SETTINGS
@given(left=LEFT, right=RIGHT)
def test_hash_join_many_matches_sql_semantics(ray_session, left, right):
    from pdf_extractor_ray.functions.joins import hash_join

    got = _pdf(hash_join(
        _ds(_left_table(left)), _ds(_right_table(right)),
        "lk", "rk", ["lk", "lv"], ["rv"],
        how="inner", validate="many", num_partitions=4,
    ))
    got_set = sorted(
        (None if k != k else int(k), int(a), int(b))
        for k, a, b in zip(got["lk"], got["lv"], got["rv"])
    )
    want = sorted(
        (lk, lv, rv)
        for lk, lv in left if lk is not None
        for rk, rv in right if rk == lk
    )
    assert got_set == want


@_SETTINGS
@given(left=LEFT, right=RIGHT)
def test_hash_join_left_many_matches_sql_semantics(ray_session, left, right):
    from pdf_extractor_ray.functions.joins import hash_join

    got = _pdf(hash_join(
        _ds(_left_table(left)), _ds(_right_table(right)),
        "lk", "rk", ["lv"], ["rv"],
        how="left", validate="many", num_partitions=4,
    ))
    got_set = sorted(
        (
            (int(a), None if b != b else int(b))
            for a, b in zip(got["lv"], got["rv"])
        ),
        key=lambda t: (t[0], t[1] is None, t[1] or 0),
    )
    want = []
    for lk, lv in left:
        matches = [rv for rk, rv in right if lk is not None and rk == lk]
        if matches:
            want.extend((lv, rv) for rv in matches)
        else:
            want.append((lv, None))
    assert got_set == sorted(want, key=lambda t: (t[0], t[1] is None, t[1] or 0))


@_SETTINGS
@given(left=LEFT, right=RIGHT, how=st.sampled_from(["semi", "anti"]))
def test_semi_anti_join_matches_sql_semantics(ray_session, left, right, how):
    from pdf_extractor_ray.functions.joins import semi_anti_join

    got = _pdf(semi_anti_join(
        _ds(_left_table(left)), _ds(_right_table(right)),
        "lk", "rk", ["lk", "lv"], how=how, num_partitions=4,
    ))
    got_set = sorted(
        (
            (None if k != k else int(k), int(v))
            for k, v in zip(got["lk"], got["lv"])
        ),
        key=lambda t: (t[0] is not None, t[0] or 0, t[1]),
    )
    rkeys = {rk for rk, _ in right if rk is not None}
    if how == "semi":
        want = [(lk, lv) for lk, lv in left if lk is not None and lk in rkeys]
    else:
        want = [(lk, lv) for lk, lv in left if lk is None or lk not in rkeys]
    assert got_set == sorted(want, key=lambda t: (t[0] is not None, t[0] or 0, t[1]))


TS = st.integers(min_value=0, max_value=50)


@_SETTINGS
@given(
    left=st.lists(st.tuples(st.integers(0, 3), TS), min_size=0, max_size=10),
    right=st.lists(st.tuples(st.integers(0, 3), TS, st.integers(0, 9)),
                   min_size=0, max_size=10),
)
def test_asof_join_matches_direct_oracle(ray_session, left, right):
    """For every left (key, ts): the right row with the same key,
    max right_ts ≤ ts, ties by max tiebreak; left-outer."""
    from pdf_extractor_ray.functions.joins import asof_join

    def us(v):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=v)

    lt = pa.table(
        {
            "k": pa.array([k for k, _ in left], pa.int64()),
            "ts": pa.array([us(t) for _, t in left], pa.timestamp("us")),
            "lid": pa.array(list(range(len(left))), pa.int64()),
        }
    )
    rt = pa.table(
        {
            "k": pa.array([k for k, _, _ in right], pa.int64()),
            "rts": pa.array([us(t) for _, t, _ in right], pa.timestamp("us")),
            "rid": pa.array([tb for _, _, tb in right], pa.int64()),
        }
    )
    got = _pdf(asof_join(
        _ds(lt), _ds(rt), key="k", left_ts="ts", right_ts="rts",
        right_tiebreak="rid", left_cols=["lid"], right_cols=["rid"],
    ))
    got_map = {
        int(l): (None if r != r else int(r))
        for l, r in zip(got["lid"], got["rid"])
    }
    assert len(got) == len(left)
    for lid, (k, ts) in enumerate(left):
        cands = [(t, tb) for rk, t, tb in right if rk == k and t <= ts]
        want = max(cands)[1] if cands else None
        assert got_map[lid] == want, (lid, k, ts, cands)


@_SETTINGS
@given(left=LEFT, right=RIGHT)
def test_hash_join_full_many_matches_sql_semantics(ray_session, left, right):
    from pdf_extractor_ray.functions.joins import hash_join

    got = _pdf(hash_join(
        _ds(_left_table(left)), _ds(_right_table(right)),
        "lk", "rk", ["lv"], ["rv"],
        how="full", validate="many", num_partitions=4,
    ))
    keyf = lambda t: (t[0] is None, t[0] or 0, t[1] is None, t[1] or 0)
    got_set = sorted(
        (
            (None if a != a else int(a), None if b != b else int(b))
            for a, b in zip(got["lv"], got["rv"])
        ),
        key=keyf,
    )
    want = []
    for lk, lv in left:
        matches = [rv for rk, rv in right if lk is not None and rk == lk]
        if matches:
            want.extend((lv, rv) for rv in matches)
        else:
            want.append((lv, None))
    for rk, rv in right:
        if rk is None or not any(lk == rk for lk, _ in left):
            want.append((None, rv))
    assert got_set == sorted(want, key=keyf)


def test_semi_anti_join_random_vs_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from pdf_extractor_ray.functions.joins import semi_anti_join

    rng = np.random.RandomState(23)
    for trial in range(3):
        left = pd.DataFrame({
            "k": rng.randint(0, 15, 200).astype("float64"),
            "v": np.arange(200),
        })
        left.loc[rng.choice(200, 10, replace=False), "k"] = np.nan
        right = pd.DataFrame({"rk": rng.randint(0, 20, 50).astype("int64")})
        lds = ray.data.from_arrow(pa.Table.from_pandas(left)).repartition(5)
        rds = ray.data.from_arrow(pa.Table.from_pandas(right)).repartition(3)
        rset = set(right.rk.tolist())
        for how in ("semi", "anti"):
            got = semi_anti_join(lds, rds, "k", "rk", ["k", "v"], how=how) \
                .to_pandas().sort_values("v").v.tolist()
            if how == "semi":
                want = left[left.k.isin(rset)].v.tolist()
            else:  # null keys match nothing → kept by anti
                want = left[~left.k.isin(rset)].v.tolist()
            assert got == want, (trial, how)


def test_latest_by_key_random_vs_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from pdf_extractor_ray.functions.dedup import latest_by_key

    rng = np.random.RandomState(29)
    df = pd.DataFrame({
        "u": rng.randint(0, 12, 300).astype("int64"),
        "ts": rng.randint(0, 50, 300).astype("int64"),
        "tb": np.arange(300, dtype="int64"),
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(7)
    got = latest_by_key(ds, "u", "ts", "tb").to_pandas() \
        .sort_values("u").reset_index(drop=True)
    want = df.sort_values(["u", "ts", "tb"]).groupby("u").tail(1) \
        .sort_values("u").reset_index(drop=True)
    assert got.u.tolist() == want.u.tolist()
    assert got.ts.tolist() == want.ts.tolist()
    assert got.tb.tolist() == want.tb.tolist()
