"""Association-rule mining over (basket, item) pairs.

The market-basket primitive a training-data curation pipeline uses to
find co-occurring labels/sources/event types: for every unordered item
pair {a, b} (a < b lexicographically), how many baskets contain BOTH,
and the classic support / confidence / lift scores derived from it.

Reference scope note: the reference engine (a per-document extractor,
see `extractor/` in /root/reference) has no cross-record analytics at
all — this is part of the engine's §2-beyond surface, not a port.

Scale plan (no driver-side data-set-sized state anywhere):
  1. distinct (basket, item) via ONE hash(basket,item) partition
     exchange (`agg.partition_fold` count, keys kept)
  2. per-item basket counts + total basket count: small folds
  3. per-basket pair enumeration: hash(basket) exchange, in-partition
     vectorized run-detect + repeat/arange pair generation (the same
     enumeration kernel as `graph.triangle_count` wedges) — a basket
     with k distinct items emits C(k, 2) pairs, so the blow-up is
     bounded by the per-basket distinct-item count, never by data size
  4. pair counts: one more partition fold
  5. scores: the per-item count table is LOW-CARDINALITY by contract
     (item is a category column — event types, languages, source tags);
     it broadcasts into the finishing map as a plain dict.

Float-parity contract (DuckDB oracle twins): every score is ONE
division of exact int64 counts, rounded half-away-from-zero to 6
digits — bit-reproducible against `round(CAST(x AS DOUBLE)/y, 6)`.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def pair_lift(ds, basket: str, item: str, num_partitions: int = 64,
              min_both: int = 1):
    """Support / confidence / lift for every co-occurring item pair.

    Returns a Dataset with one row per unordered pair (``<item>_a`` <
    ``<item>_b``): ``n_both`` (baskets containing both), ``support``
    (= n_both / n_baskets), ``conf_a_b`` (= n_both / n_a, the
    confidence of a ⇒ b) and ``lift`` (= n_both·n_baskets / (n_a·n_b);
    > 1 means the pair co-occurs more than independence predicts).
    Pairs with ``n_both < min_both`` are dropped.
    """
    from .agg import partition_fold

    col_a, col_b = f"{item}_a", f"{item}_b"

    # 1. distinct (basket, item) — one exchange, keys kept
    pairs = partition_fold(
        ds.select_columns([basket, item]), [basket, item], basket,
        fn="count", out_val="__n", num_partitions=num_partitions,
    ).select_columns([basket, item])

    # 2. small folds: per-item basket counts; total distinct baskets
    item_counts = partition_fold(
        pairs, [item], basket, fn="count", out_val="n_item",
        num_partitions=num_partitions,
    )
    n_baskets = partition_fold(
        pairs, [basket], item, fn="count", out_val="__n",
        num_partitions=num_partitions,
    ).count()

    # 3. per-basket pair enumeration, co-partitioned by basket
    from .joins import _bucket_of

    def add_part(batch: pa.Table) -> pa.Table:
        b = _bucket_of(batch.column(basket), num_partitions)
        return batch.append_column(
            "__p", pa.array(np.asarray(
                b.to_numpy(zero_copy_only=False), dtype=np.int32))
        )

    def gen_pairs(group: pa.Table) -> pa.Table:
        items = group.column(item).to_numpy(zero_copy_only=False)
        keys = group.column(basket).to_numpy(zero_copy_only=False)
        empty = pa.table({col_a: pa.array([], pa.string()),
                          col_b: pa.array([], pa.string())})
        n = len(items)
        if n < 2:
            return empty
        # factorize items so the sort/pair kernel runs on int codes;
        # np.unique returns SORTED uniques, so code order == string order
        uniq, codes = np.unique(items, return_inverse=True)
        kuniq, kcodes = np.unique(keys, return_inverse=True)
        order = np.lexsort((codes, kcodes))
        kc, ic = kcodes[order], codes[order]
        change = np.nonzero(kc[1:] != kc[:-1])[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [n]])
        run_end = np.repeat(ends, ends - starts)
        reps = run_end - 1 - np.arange(n)
        total = int(reps.sum())
        if total == 0:
            return empty
        left = np.repeat(np.arange(n), reps)
        off = np.cumsum(reps) - reps
        right = np.arange(total) - np.repeat(off, reps) + left + 1
        # items sorted ascending within a basket run ⇒ code_a < code_b
        return pa.table({
            col_a: pa.array(uniq[ic[left]]),
            col_b: pa.array(uniq[ic[right]]),
        })

    basket_pairs = (
        pairs.map_batches(add_part, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(gen_pairs, batch_format="pyarrow")
    )

    # 4. pair counts
    both = partition_fold(
        basket_pairs, [col_a, col_b], col_a, fn="count", out_val="n_both",
        num_partitions=num_partitions,
    )

    # 5. scores — item-count table is low-cardinality by contract
    counts = {
        r[item]: int(r["n_item"]) for r in item_counts.take_all()
    }
    from .text import _round6_half_up

    def score(batch: pa.Table) -> pa.Table:
        a = batch.column(col_a).to_numpy(zero_copy_only=False)
        b = batch.column(col_b).to_numpy(zero_copy_only=False)
        nb = batch.column("n_both").to_numpy(zero_copy_only=False)
        keep = nb >= min_both
        a, b, nb = a[keep], b[keep], nb[keep]
        na = np.array([counts[x] for x in a], dtype=np.int64)
        nbb = np.array([counts[x] for x in b], dtype=np.int64)
        support = _round6_half_up(nb.astype(np.float64) / n_baskets)
        conf = _round6_half_up(nb.astype(np.float64) / na)
        lift = _round6_half_up(
            (nb * np.int64(n_baskets)).astype(np.float64)
            / (na * nbb).astype(np.float64)
        )
        return pa.table({
            col_a: pa.array(a), col_b: pa.array(b),
            "n_both": pa.array(nb, pa.int64()),
            "support": pa.array(support, pa.float64()),
            "conf_a_b": pa.array(conf, pa.float64()),
            "lift": pa.array(lift, pa.float64()),
        })

    return both.map_batches(score, batch_format="pyarrow")
