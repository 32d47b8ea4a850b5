"""Unit tests: broadcast_join (map-side dim join), rollup_agg
(GROUP BY ROLLUP), rank_in_group (ROW_NUMBER window)."""
import datetime

import pyarrow as pa
import pytest


def _ds(t):
    import ray.data

    return ray.data.from_arrow(t)


@pytest.fixture()
def facts():
    return pa.table(
        {
            "k": pa.array([1, 2, 2, 3, None], pa.int64()),
            "v": pa.array([10, 20, 21, 30, 40], pa.int64()),
        }
    )


@pytest.fixture()
def dim():
    return pa.table(
        {
            "dk": pa.array([1, 2, 9], pa.int64()),
            "name": pa.array(["one", "two", "nine"]),
        }
    )


def test_broadcast_join_inner(ray_session, facts, dim):
    from pdf_extractor_ray.functions.joins import broadcast_join

    out = broadcast_join(_ds(facts), _ds(dim), "k", "dk", ["name"]).to_pandas()
    got = sorted(zip(out["v"], out["name"]))
    assert got == [(10, "one"), (20, "two"), (21, "two")]


def test_broadcast_join_left_null_extends(ray_session, facts, dim):
    from pdf_extractor_ray.functions.joins import broadcast_join

    out = broadcast_join(
        _ds(facts), _ds(dim), "k", "dk", ["name"], how="left"
    ).to_pandas()
    got = {v: (None if n != n and not isinstance(n, str) else n)
           for v, n in zip(out["v"], out["name"])}
    assert got == {10: "one", 20: "two", 21: "two", 30: None, 40: None}


def test_broadcast_join_duplicate_right_raises(ray_session, facts):
    from pdf_extractor_ray.functions.joins import broadcast_join

    dup = pa.table({"dk": pa.array([1, 1], pa.int64()),
                    "name": pa.array(["a", "b"])})
    with pytest.raises(ValueError, match="duplicate join keys"):
        broadcast_join(_ds(facts), _ds(dup), "k", "dk", ["name"])


def test_broadcast_join_size_cap_raises(ray_session, facts, dim):
    from pdf_extractor_ray.functions.joins import broadcast_join

    with pytest.raises(ValueError, match="too large to broadcast"):
        broadcast_join(_ds(facts), _ds(dim), "k", "dk", ["name"],
                       max_right_bytes=1)


def test_rollup_agg_levels(ray_session):
    from pdf_extractor_ray.functions.agg import rollup_agg

    t = pa.table(
        {
            "a": pa.array(["x", "x", "y", "y"]),
            "b": pa.array(["p", "q", "p", "p"]),
            "v": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        }
    )
    out = rollup_agg(
        _ds(t), ["a", "b"],
        [("v", "sum", "s"), ("v", "count", "n"), ("v", "mean", "m")],
    )
    rows = {
        (r["a"], r["b"]): (r["s"], r["n"], r["m"])
        for r in out.to_pylist()
    }
    assert rows == {
        ("x", "p"): (1.0, 1, 1.0),
        ("x", "q"): (2.0, 1, 2.0),
        ("y", "p"): (7.0, 2, 3.5),
        ("x", None): (3.0, 2, 1.5),
        ("y", None): (7.0, 2, 3.5),
        (None, None): (10.0, 4, 2.5),
    }


def test_rollup_agg_null_key_raises(ray_session):
    from pdf_extractor_ray.functions.agg import rollup_agg

    t = pa.table({"a": pa.array(["x", None]), "v": pa.array([1, 2], pa.int64())})
    with pytest.raises(ValueError, match="NULL"):
        rollup_agg(_ds(t), ["a"], [("v", "sum", "s")])


def test_rank_in_group_orders_and_ties(ray_session):
    from pdf_extractor_ray.functions.window import rank_in_group

    base = datetime.datetime(2024, 1, 1)
    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(
                [base + datetime.timedelta(days=d) for d in (2, 0, 0, 5)],
                pa.timestamp("us"),
            ),
            "id": pa.array([7, 9, 8, 1], pa.int64()),
        }
    )
    out = rank_in_group(_ds(t), "k", ["ts", "id"], out_col="rn").to_pandas()
    got = {int(i): int(r) for i, r in zip(out["id"], out["rn"])}
    # key 1 ordered by (ts, id): id 8 (day0), id 9 (day0), id 7 (day2)
    assert got == {8: 1, 9: 2, 7: 3, 1: 1}


def test_lag_attach_and_moving_avg(ray_session):
    from pdf_extractor_ray.functions.window import lag_attach, moving_avg

    base = datetime.datetime(2024, 1, 1)
    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(
                [base + datetime.timedelta(days=d) for d in (0, 1, 2, 0)],
                pa.timestamp("us"),
            ),
            "id": pa.array([10, 11, 12, 20], pa.int64()),
            "v": pa.array([1.0, 2.0, 4.0, 9.0], pa.float64()),
        }
    )
    ds = _ds(t)
    lag = lag_attach(ds, "k", "ts", "v", "id").to_pandas()
    got = {int(i): (None if p != p else float(p))
           for i, p in zip(lag["id"], lag["prev_value"])}
    assert got == {10: None, 11: 1.0, 12: 2.0, 20: None}

    ma = moving_avg(_ds(t), "k", "ts", "v", "id", window_rows=2).to_pandas()
    got = {int(i): float(m) for i, m in zip(ma["id"], ma["moving_avg"])}
    assert got == {10: 1.0, 11: 1.5, 12: 3.0, 20: 9.0}


def test_cube_agg_all_subsets(ray_session):
    from pdf_extractor_ray.functions.agg import cube_agg

    t = pa.table(
        {
            "a": pa.array(["x", "x", "y"]),
            "b": pa.array(["p", "q", "p"]),
            "v": pa.array([1, 2, 4], pa.int64()),
        }
    )
    out = cube_agg(_ds(t), ["a", "b"], [("v", "sum", "s")])
    rows = {(r["a"], r["b"]): r["s"] for r in out.to_pylist()}
    assert rows == {
        ("x", "p"): 1, ("x", "q"): 2, ("y", "p"): 4,
        ("x", None): 3, ("y", None): 4,
        (None, "p"): 5, (None, "q"): 2,
        (None, None): 7,
    }


def test_grouping_sets_arbitrary_subsets(ray_session):
    from pdf_extractor_ray.functions.agg import grouping_sets_agg

    t = pa.table(
        {
            "a": pa.array(["x", "x", "y", "y"]),
            "b": pa.array(["p", "q", "p", "p"]),
            "v": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        }
    )
    # (b) alone is NOT a rollup prefix of (a, b); () is the grand total
    out = grouping_sets_agg(
        _ds(t), ["a", "b"], sets=[("b",), ()],
        specs=[("v", "sum", "s"), ("v", "count", "n")],
    )
    rows = {(r["a"], r["b"]): (r["s"], r["n"]) for r in out.to_pylist()}
    assert rows == {
        (None, "p"): (8.0, 3),
        (None, "q"): (2.0, 1),
        (None, None): (10.0, 4),
    }


def test_grouping_sets_includes_finest_when_requested(ray_session):
    from pdf_extractor_ray.functions.agg import grouping_sets_agg

    t = pa.table(
        {
            "a": pa.array(["x", "y"]),
            "v": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    out = grouping_sets_agg(
        _ds(t), ["a"], sets=[("a",), ("a",), ()],  # duplicate set deduped
        specs=[("v", "sum", "s")],
    )
    rows = {r["a"]: r["s"] for r in out.to_pylist()}
    assert rows == {"x": 1.0, "y": 2.0, None: 3.0}
    assert len(out) == 3


def test_grouping_sets_rejects_unknown_column(ray_session):
    from pdf_extractor_ray.functions.agg import grouping_sets_agg

    t = pa.table({"a": pa.array(["x"]), "v": pa.array([1.0])})
    with pytest.raises(ValueError, match="non-key columns"):
        grouping_sets_agg(_ds(t), ["a"], sets=[("z",)],
                          specs=[("v", "sum", "s")])


def test_broadcast_cross_join_grid_and_cap(ray_session):
    import ray.data

    from pdf_extractor_ray.functions.joins import broadcast_cross_join

    left = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 2, 3], pa.int64()),
    }))
    right = pa.table({"b": pa.array(["x", "y"], pa.string())})
    out = broadcast_cross_join(left, right).to_pandas()
    assert len(out) == 6
    assert sorted(map(tuple, out.itertuples(index=False))) == [
        (1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "y")]
    big = pa.table({"b": pa.array(range(20_001), pa.int64())})
    with pytest.raises(ValueError, match="max_right_rows"):
        broadcast_cross_join(left, big, max_right_rows=10_000)
