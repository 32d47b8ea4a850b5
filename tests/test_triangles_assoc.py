"""Triangle counting, whole-graph stats, association rules."""
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from pdf_extractor_ray.functions.assoc import pair_lift
from pdf_extractor_ray.functions.graph import graph_stats, triangle_count


def _edges_ds():
    # K4 on {1,2,3,4} (4 triangles) + pendant 5—4 + self-loop 6—6,
    # with duplicate and reversed directed edges thrown in
    return ray.data.from_arrow(pa.table({
        "src": [1, 2, 3, 1, 2, 4, 1, 4, 5, 6, 2, 3, 4],
        "dst": [2, 3, 1, 3, 4, 1, 4, 2, 4, 6, 1, 4, 3],
    }))


def test_triangle_count_k4(ray_session):
    out = triangle_count(_edges_ds()).to_pandas().sort_values("node")
    assert out["node"].tolist() == [1, 2, 3, 4]
    # every K4 node sits in 3 of the 4 triangles; 5 and 6 in none
    assert out["n_tri"].tolist() == [3, 3, 3, 3]


def test_triangle_count_no_triangles(ray_session):
    ds = ray.data.from_arrow(pa.table({"src": [1, 2, 3], "dst": [2, 3, 4]}))
    assert triangle_count(ds).count() == 0


def test_triangle_count_matches_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    src = rng.integers(0, 40, 400)
    dst = rng.integers(0, 40, 400)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    got = {
        (r["node"], r["n_tri"])
        for r in triangle_count(ds).take_all()
    }
    # brute force over the canonical undirected simple graph
    pairs = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    nodes = sorted({n for p in pairs for n in p})
    want: dict[int, int] = {}
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if (x, y) not in pairs:
                continue
            for z in nodes:
                if z <= y:
                    continue
                if (x, z) in pairs and (y, z) in pairs:
                    for n in (x, y, z):
                        want[n] = want.get(n, 0) + 1
    assert got == {(n, c) for n, c in want.items()}


def test_graph_stats_known(ray_session):
    row = graph_stats(_edges_ds()).take_all()[0]
    assert row["n_nodes"] == 6
    assert row["n_edges"] == 13          # distinct directed, self-loop incl.
    assert row["n_self_loops"] == 1
    assert row["n_undirected"] == 7
    assert row["n_reciprocal"] == 10     # 5 pairs present both ways
    assert row["reciprocity"] == pytest.approx(round(10 / 12, 6))
    assert row["max_out_deg"] == 3
    assert row["avg_out_deg"] == pytest.approx(round(12 / 5, 6))


def test_graph_stats_empty(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    )
    row = graph_stats(ds).take_all()[0]
    assert row["n_nodes"] == 0 and row["n_edges"] == 0


def test_pair_lift_hand_checked(ray_session):
    # u1:{a,b}, u2:{a,b}, u3:{a,c}, u4:{b} — n_baskets=4,
    # n_a=3, n_b=3, n_c=1; both(a,b)=2, both(a,c)=1
    ds = ray.data.from_arrow(pa.table({
        "u": ["u1", "u1", "u2", "u2", "u3", "u3", "u4", "u1"],
        "it": ["a", "b", "a", "b", "a", "c", "b", "a"],  # (u1,a) repeated
    }))
    out = {
        (r["it_a"], r["it_b"]): r
        for r in pair_lift(ds, "u", "it").take_all()
    }
    assert set(out) == {("a", "b"), ("a", "c")}
    ab = out[("a", "b")]
    assert ab["n_both"] == 2
    assert ab["support"] == pytest.approx(0.5)
    assert ab["conf_a_b"] == pytest.approx(round(2 / 3, 6))
    assert ab["lift"] == pytest.approx(round(2 * 4 / 9, 6))
    ac = out[("a", "c")]
    assert ac["n_both"] == 1
    assert ac["lift"] == pytest.approx(round(1 * 4 / 3, 6))


def test_pair_lift_min_both(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "u": ["u1", "u1", "u2", "u2", "u3", "u3"],
        "it": ["a", "b", "a", "b", "a", "c"],
    }))
    out = pair_lift(ds, "u", "it", min_both=2).take_all()
    assert [(r["it_a"], r["it_b"]) for r in out] == [("a", "b")]
