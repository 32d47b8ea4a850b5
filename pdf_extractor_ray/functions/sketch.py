"""Approximate aggregates: HyperLogLog distinct-count sketch.

The reference has no sketches (SURVEY §2.5); at 100 TB an exact
distinct over a high-cardinality column is a full shuffle, while an
HLL sketch is a CONSTANT-size (2^p bytes) register array that merges
associatively — the canonical partial-aggregation shape:

    map_batches: hash column → per-block register array   [distributed]
    merge: element-wise max over register arrays          [tiny]
    estimate: bias-corrected harmonic mean (Flajolet et al. 2007,
              with the standard linear-counting small-range correction)

Error ≈ 1.04/√(2^p): p=12 → ~1.6%.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64) over int64 input."""
    x = values.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z &= np.uint64(0xFFFFFFFFFFFFFFFF)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z &= np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def _registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """hashes → HLL register array (vectorized)."""
    m = 1 << p
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits, +1 (capped)
    # computed via bit_length: rank = (64 - p) - floor(log2(rest)) for rest>0
    regs = np.zeros(m, dtype=np.uint8)
    nz = rest != 0
    # np.log2 on uint64 is lossy near 2^64; use float64 carefully with clip
    bitlen = np.zeros(len(rest), dtype=np.int64)
    r = rest[nz].astype(np.float64)
    bitlen_nz = np.floor(np.log2(r)).astype(np.int64) + 1
    bitlen[nz] = bitlen_nz
    rank = np.where(nz, 64 - bitlen + 1, 64 - p + 1).astype(np.uint8)
    rank = np.minimum(rank, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray, p: int) -> float:
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range correction
    return float(est)


def approx_distinct(ds, col: str, p: int = 12) -> int:
    """Distributed HLL distinct estimate for an integer column."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch.column(col).to_pylist(), dtype=np.int64)
        regs = _registers(_hash64(vals), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def max_merge(batch: pa.Table) -> pa.Table:
        acc = np.zeros(1 << p, dtype=np.uint8)
        for blob in batch.column("regs").to_pylist():
            acc = np.maximum(acc, np.frombuffer(blob, dtype=np.uint8))
        return pa.table({"regs": pa.array([acc.tobytes()], pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for t in _tree_partials(ds.map_batches(partial, batch_format="pyarrow"),
                            max_merge):
        for blob in t.column("regs").to_pylist():
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
    return round(_estimate(merged, p))


def approx_quantiles(ds, col: str, qs=(0.25, 0.5, 0.75, 0.9),
                     n_bins: int = 4096) -> pa.Table:
    """Approximate quantiles for an UNBOUNDED-cardinality numeric
    column (``agg.exact_quantiles`` requires bounded distinct values).

    Two streaming passes, both constant-size payloads:
    1. global min/max (native aggregate)
    2. per-block fixed-width ``np.bincount`` histogram — one 32 KiB
       int64[n_bins] array per block, summed on the driver

    Deterministic, mergeable, error ≤ (max-min)/n_bins in VALUE space
    (the returned value is the lower edge of the quantile's bin,
    linearly interpolated within the bin by rank). The classic
    distributed-quantile shape when a t-digest dependency isn't
    available.
    """
    import math

    import ray
    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(col), Max(col))
    lo, hi = float(mm[f"min({col})"]), float(mm[f"max({col})"])
    if hi == lo:
        return pa.table(
            {"q": pa.array([float(q) for q in qs], pa.float64()),
             "value": pa.array([lo] * len(qs), pa.float64())}
        )
    width = (hi - lo) / n_bins

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(col).to_pylist(), dtype=np.float64)
        v = v[~np.isnan(v)]
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, n_bins - 1)
        c = np.bincount(idx, minlength=n_bins).astype(np.int64)
        return pa.table({"counts": pa.array([c.tobytes()], pa.binary())})

    def add_merge(batch: pa.Table) -> pa.Table:
        acc = np.zeros(n_bins, dtype=np.int64)
        for blob in batch.column("counts").to_pylist():
            acc += np.frombuffer(blob, dtype=np.int64)
        return pa.table({"counts": pa.array([acc.tobytes()], pa.binary())})

    counts = np.zeros(n_bins, dtype=np.int64)
    for t in _tree_partials(ds.map_batches(partial, batch_format="pyarrow"),
                            add_merge):
        for blob in t.column("counts").to_pylist():
            counts += np.frombuffer(blob, dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, math.ceil(q * n))
        b = int(np.searchsorted(cum, rank, side="left"))
        prev = int(cum[b - 1]) if b else 0
        frac = (rank - prev) / max(int(counts[b]), 1)
        out_q.append(float(q))
        out_v.append(lo + (b + frac) * width)
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.float64())}
    )


def _tree_partials(partials_ds, merge_fn, max_driver_blobs: int = 64):
    """Yield partial-sketch tables with a bounded driver fan-in: when
    the partial count exceeds ``max_driver_blobs``, one distributed
    merge level (repartition + per-partition fold) runs first, so the
    driver only ever receives ≤ max_driver_blobs fixed-size blobs —
    at 10^5 input blocks the naive collect would ship tens of GB of
    128-512 KiB partials to one process."""
    import ray

    m = partials_ds.materialize()
    if m.num_blocks() > max_driver_blobs:
        m = (m.repartition(max_driver_blobs)
              .map_batches(merge_fn, batch_format="pyarrow")
              .materialize())
    for r in m.to_arrow_refs():
        yield ray.get(r)


def bloom_build(ds, col: str, n_bits: int = 1 << 20, k: int = 4) -> np.ndarray:
    """Distributed Bloom filter over an integer key column.

    Per block: k salted splitmix64 hashes set bits in a LOCAL bitmap;
    only the fixed-size bitmap (n_bits/8 bytes, 128 KiB at the
    default) leaves each task, and merge is a bitwise OR — the same
    constant-size mergeable-sketch shape as HLL. False-positive rate
    ≈ (1 - e^(-k·n/m))^k; size m for your n accordingly.

    Use as a shuffle pre-filter: at 100 TB, ship the 128 KiB filter to
    every task instead of hash-shuffling the big side against a
    membership set — rows that fail the bloom never enter the exact
    join. No false negatives, so a bloom-then-exact-verify plan is
    exactly semi-join semantics at a fraction of the shuffle volume.
    """
    import ray

    words = n_bits // 64

    def partial(batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch.column(col).to_pylist(), dtype=np.int64).astype(
            np.uint64
        )
        bits = np.zeros(words, dtype=np.uint64)
        for i in range(k):
            h = _hash64(vals + np.uint64(0x9E37 * (i + 1))) % np.uint64(n_bits)
            np.bitwise_or.at(bits, (h >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (h & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    def or_merge(batch: pa.Table) -> pa.Table:
        acc = np.zeros(words, dtype=np.uint64)
        for blob in batch.column("bits").to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.binary())})

    merged = np.zeros(words, dtype=np.uint64)
    for t in _tree_partials(ds.map_batches(partial, batch_format="pyarrow"),
                            or_merge):
        for blob in t.column("bits").to_pylist():
            merged |= np.frombuffer(blob, dtype=np.uint64)
    return merged


def bloom_contains(bloom: np.ndarray, vals: np.ndarray, n_bits: int, k: int = 4):
    """Vectorized membership test (bool array); no false negatives."""
    vals = vals.astype(np.uint64)
    ok = np.ones(len(vals), dtype=bool)
    for i in range(k):
        h = _hash64(vals + np.uint64(0x9E37 * (i + 1))) % np.uint64(n_bits)
        word = bloom[(h >> np.uint64(6)).astype(np.int64)]
        ok &= (word >> (h & np.uint64(63))) & np.uint64(1) != 0
    return ok


def bloom_prefilter(ds, col: str, bloom: np.ndarray, n_bits: int = 1 << 20,
                    k: int = 4):
    """Keep only rows whose key MIGHT be in the bloom (broadcast via
    ``ray.put`` once, zero-copy read per task). Pair with an exact
    semi-join downstream for exact semantics."""
    import ray

    bloom_ref = ray.put(bloom)

    def fn(batch: pa.Table) -> pa.Table:
        b = ray.get(bloom_ref)
        vals = np.asarray(batch.column(col).to_pylist(), dtype=np.int64)
        return batch.filter(pa.array(bloom_contains(b, vals, n_bits, k)))

    return ds.map_batches(fn, batch_format="pyarrow")


def approx_distinct_by(ds, group_col: str, col: str, p: int = 12):
    """Per-group HLL distinct estimate — ``approx_count_distinct(col)
    GROUP BY group_col`` without shuffling the values.

    Shape: per block, ONE register array per group present in the
    block (a low-cardinality contract on ``group_col``, same as
    ``lowcard_groupby_agg`` — enforced loudly); only (group, 2^p-byte
    registers) rows leave the map stage, so the reduce is tiny and
    independent of row count. Returns a pa.Table
    (group_col, approx_distinct:int64) sorted by group.
    """
    import ray

    max_groups = 1024

    def partial(batch: pa.Table) -> pa.Table:
        groups = batch.column(group_col).to_pylist()
        vals = np.asarray(batch.column(col).to_pylist(), dtype=np.int64)
        hashes = _hash64(vals)
        # SQL GROUP BY semantics: null keys form their own group (a
        # None among strings breaks sorted(); bucket it explicitly)
        uniq = sorted({g for g in groups if g is not None})
        has_null = any(g is None for g in groups)
        if len(uniq) + has_null > max_groups:
            raise ValueError(
                f"approx_distinct_by: {len(uniq) + has_null} groups in one "
                f"block (> {max_groups}) — group_col is not low-cardinality; "
                "use an exact shuffle-based distinct instead"
            )
        garr = np.asarray(groups, dtype=object)
        out_g, out_r = [], []
        for g in uniq:
            out_g.append(g)
            out_r.append(_registers(hashes[garr == g], p).tobytes())
        if has_null:
            out_g.append(None)
            null_mask = np.asarray([g is None for g in groups])
            out_r.append(_registers(hashes[null_mask], p).tobytes())
        return pa.table(
            {group_col: pa.array(out_g), "regs": pa.array(out_r, pa.binary())}
        )

    parts = [
        ray.get(r)
        for r in ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ]
    merged: dict = {}
    for t in parts:
        for g, blob in zip(t.column(group_col).to_pylist(),
                           t.column("regs").to_pylist()):
            regs = np.frombuffer(blob, dtype=np.uint8)
            merged[g] = np.maximum(merged[g], regs) if g in merged else regs
    keys = sorted(k for k in merged if k is not None)
    if None in merged:
        keys.append(None)
    return pa.table(
        {
            group_col: pa.array(keys),
            "approx_distinct": pa.array(
                [round(_estimate(merged[g], p)) for g in keys], pa.int64()
            ),
        }
    )


# ------------------------------------------------------------- count-min
def cms_build(ds, col: str, weight_col: "str | None" = None,
              depth: int = 4, width: int = 1 << 14) -> np.ndarray:
    """Distributed Count-Min sketch over an int64 key column
    (optionally weighted): per block a LOCAL depth×width int64 matrix
    accumulates counts at d salted-hash positions; only the fixed-size
    matrix (depth·width·8 bytes, 512 KiB at the defaults) leaves each
    task and merge is elementwise +, the same constant-size mergeable
    shape as HLL/Bloom.

    Point estimate = min over rows (cms_estimate): NEVER an
    underestimate, overestimate bounded by ε·N with ε = e/width at
    probability 1-e^-depth (Cormode & Muthukrishnan 2005). The
    bounded-memory frequency table for key spaces too large to
    groupby — heavy-hitter candidates, join-skew probes, frequency
    caps — where ``text.heavy_hitters``'s per-block top-M truncation
    can miss mid-tail keys.
    """
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch.column(col).to_pylist(), dtype=np.int64).astype(
            np.uint64
        )
        w = (np.asarray(batch.column(weight_col).to_pylist(), dtype=np.int64)
             if weight_col else np.ones(len(vals), dtype=np.int64))
        m = np.zeros((depth, width), dtype=np.int64)
        for i in range(depth):
            h = (_hash64(vals + np.uint64(0xC2B2 * (i + 1)))
                 % np.uint64(width)).astype(np.int64)
            np.add.at(m[i], h, w)
        return pa.table({"m": pa.array([m.tobytes()], pa.binary())})

    def add_merge(batch: pa.Table) -> pa.Table:
        acc = np.zeros((depth, width), dtype=np.int64)
        for blob in batch.column("m").to_pylist():
            acc += np.frombuffer(blob, dtype=np.int64).reshape(depth, width)
        return pa.table({"m": pa.array([acc.tobytes()], pa.binary())})

    merged = np.zeros((depth, width), dtype=np.int64)
    for t in _tree_partials(ds.map_batches(partial, batch_format="pyarrow"),
                            add_merge):
        for blob in t.column("m").to_pylist():
            merged += np.frombuffer(blob, dtype=np.int64).reshape(depth, width)
    return merged


def cms_estimate(cms: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Vectorized point estimates (int64 array, ≥ true counts)."""
    depth, width = cms.shape
    vals = np.asarray(vals, dtype=np.int64).astype(np.uint64)
    est = np.full(len(vals), np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(depth):
        h = (_hash64(vals + np.uint64(0xC2B2 * (i + 1)))
             % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, cms[i][h])
    return est
