

def test_graph_gate_bounded_by_bytes(ray_session):
    """The driver-local plan gate is bounded in BYTES as well as edge
    count: a tiny byte cap forces the distributed path even when the
    edge count is under the count gate, and both paths agree."""
    import pyarrow as pa
    import ray.data

    from pdf_extractor_ray.functions.graph import connected_components

    pairs = pa.table({
        "id_a": pa.array([1, 2, 5, 6], pa.int64()),
        "id_b": pa.array([2, 3, 6, 7], pa.int64()),
    })
    ds = ray.data.from_arrow(pairs)
    local = connected_components(ds, max_iter=10).to_pandas()
    forced = connected_components(
        ray.data.from_arrow(pairs), max_iter=10, local_max_bytes=1
    ).to_pandas()
    key = lambda df: sorted(map(tuple, df[["node", "component"]].itertuples(index=False)))
    assert key(local) == key(forced)
