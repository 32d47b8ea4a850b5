"""Bucketed (co-partitioned) storage: shuffle-free joins."""
from __future__ import annotations

import pyarrow as pa


def _write(ds, key, out, nb):
    from pdf_extractor_ray.functions.bucketed import write_bucketed

    return write_bucketed(ds, key, out, nb).to_pandas()


def test_bucketed_write_and_join_matches_plain_join(ray_session, tmp_path):
    import ray.data

    from pdf_extractor_ray.functions.bucketed import bucketed_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3, 5, None], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d", "e", "n"], pa.string()),
    }))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 2, 3, 4], pa.int64()),
        "rv": pa.array(["x", "y", "z", "w"], pa.string()),
    }))
    nb = 4
    man_l = _write(left, "k", str(tmp_path / "l"), nb)
    man_r = _write(right, "rk", str(tmp_path / "r"), nb)
    assert man_l["n_rows"].sum() == 6 and man_r["n_rows"].sum() == 4
    out = bucketed_join(str(tmp_path / "l"), str(tmp_path / "r"), "k",
                        ["k", "lv"], ["rv"], right_key="rk",
                        num_buckets=nb).to_pandas()
    got = sorted(map(tuple, out[["k", "lv", "rv"]].itertuples(index=False)))
    # m:n semantics: k=2 joins both right rows per left row
    want = sorted([(2, "b", "x"), (2, "b", "y"), (2, "c", "x"),
                   (2, "c", "y"), (3, "d", "z")])
    assert got == want


def test_bucketed_write_idempotent(ray_session, tmp_path):
    import os

    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(list(range(20)), pa.int64()),
        "v": pa.array([f"v{i}" for i in range(20)], pa.string()),
    }))
    out = str(tmp_path / "t")
    _write(ds, "k", out, 4)
    files1 = sorted(os.path.join(d, f) for d, _, fs in os.walk(out) for f in fs)
    _write(ds, "k", out, 4)
    files2 = sorted(os.path.join(d, f) for d, _, fs in os.walk(out) for f in fs)
    assert files1 == files2  # content-hash names → re-run rewrites in place


def test_bucketed_join_string_keys(ray_session, tmp_path):
    import ray.data

    from pdf_extractor_ray.functions.bucketed import bucketed_join

    l = ray.data.from_arrow(pa.table({
        "h": pa.array(["a.com", "b.com", "c.com"], pa.string()),
        "n": pa.array([1, 2, 3], pa.int64()),
    }))
    r = ray.data.from_arrow(pa.table({
        "h": pa.array(["b.com", "c.com", "d.com"], pa.string()),
        "m": pa.array([20, 30, 40], pa.int64()),
    }))
    _write(l, "h", str(tmp_path / "l"), 8)
    _write(r, "h", str(tmp_path / "r"), 8)
    out = bucketed_join(str(tmp_path / "l"), str(tmp_path / "r"), "h",
                        ["h", "n"], ["m"], num_buckets=8).to_pandas()
    assert sorted(map(tuple, out.itertuples(index=False))) == [
        ("b.com", 2, 20), ("c.com", 3, 30)]


def test_bucketed_groupby_is_exact(ray_session, tmp_path):
    import ray.data

    from pdf_extractor_ray.functions.bucketed import bucketed_groupby

    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 3, 3, 3], pa.int64()),
        "v": pa.array([10, 20, 5, 1, 2, 3], pa.int64()),
    }))
    out_dir = str(tmp_path / "g")
    _write(ds, "k", out_dir, 4)
    out = bucketed_groupby(
        out_dir, "k", [("v", "count", "n"), ("v", "sum", "total")],
        num_buckets=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out.to_dict("list") == {"k": [1, 2, 3], "n": [2, 1, 3],
                                   "total": [30, 5, 6]}


def test_bucketed_left_join(ray_session, tmp_path):
    import ray.data

    from pdf_extractor_ray.functions.bucketed import bucketed_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "lv": pa.array(["a", "b", "c"], pa.string()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2], pa.int64()),
        "rv": pa.array(["x"], pa.string()),
    }))
    _write(left, "k", str(tmp_path / "l"), 4)
    _write(right, "k", str(tmp_path / "r"), 4)
    out = bucketed_join(str(tmp_path / "l"), str(tmp_path / "r"), "k",
                        ["k", "lv"], ["rv"], num_buckets=4,
                        how="left").to_pandas()
    got = sorted(
        (int(k), lv, (rv if isinstance(rv, str) else None))
        for k, lv, rv in out.itertuples(index=False)
    )
    assert got == [(1, "a", None), (2, "b", "x"), (3, "c", None)]


def test_bucketed_write_same_keys_different_payloads(ray_session, tmp_path):
    """Two blocks with IDENTICAL key sequences but different non-key
    values must both land on disk (filename hashes the whole block,
    not just the key column — ADVICE r3)."""
    import ray.data

    t1 = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                   "v": pa.array(["a", "b", "c"], pa.string())})
    t2 = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                   "v": pa.array(["d", "e", "f"], pa.string())})
    ds = ray.data.from_arrow([t1, t2])  # two blocks, same hot key
    out = str(tmp_path / "hot")
    man = _write(ds, "k", out, 4)
    assert man["n_rows"].sum() == 6
    import glob as _g

    import pyarrow.parquet as pq

    rows = sum(pq.read_metadata(f).num_rows
               for f in _g.glob(f"{out}/bucket=*/*.parquet"))
    assert rows == 6


def test_bucketed_write_clears_stale_parts(ray_session, tmp_path):
    """A re-run with different block boundaries must not leave prior
    parts duplicating rows."""
    import glob as _g

    import pyarrow.parquet as pq
    import ray.data

    t = pa.table({"k": pa.array(list(range(12)), pa.int64()),
                  "v": pa.array([f"v{i}" for i in range(12)], pa.string())})
    out = str(tmp_path / "re")
    _write(ray.data.from_arrow(t).repartition(3), "k", out, 4)
    _write(ray.data.from_arrow(t).repartition(5), "k", out, 4)
    rows = sum(pq.read_metadata(f).num_rows
               for f in _g.glob(f"{out}/bucket=*/*.parquet"))
    assert rows == 12  # not 24


def test_bucketed_left_join_empty_bucket_typed_nulls(ray_session, tmp_path):
    """Left join where some buckets have NO right-side files must emit
    properly typed right columns in every task (no null-type columns)."""
    import ray.data

    from pdf_extractor_ray.functions.bucketed import bucketed_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(list(range(16)), pa.int64()),
        "lv": pa.array([f"l{i}" for i in range(16)], pa.string()),
    }))
    # right side covers only ONE key → most buckets empty on the right
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([3], pa.int64()),
        "rv": pa.array([7], pa.int64()),
    }))
    nb = 8
    _write(left, "k", str(tmp_path / "l"), nb)
    _write(right, "rk", str(tmp_path / "r"), nb)
    joined = bucketed_join(str(tmp_path / "l"), str(tmp_path / "r"), "k",
                           ["k", "lv"], ["rv"], right_key="rk",
                           num_buckets=nb, how="left")
    sch = joined.schema()
    assert str(sch.base_schema.field("rv").type) == "int64"
    df = joined.to_pandas().sort_values("k").reset_index(drop=True)
    assert len(df) == 16
    assert df.loc[df["k"] == 3, "rv"].iloc[0] == 7
    assert df.loc[df["k"] != 3, "rv"].isna().all()
