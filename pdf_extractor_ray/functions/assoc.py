"""Association-rule mining over (basket, item) pairs.

The market-basket primitive a training-data curation pipeline uses to
find co-occurring labels/sources/event types: for every unordered item
pair {a, b} (a < b lexicographically), how many baskets contain BOTH,
and the classic support / confidence / lift scores derived from it.

Reference scope note: the reference engine (a per-document extractor,
see `extractor/` in /root/reference) has no cross-record analytics at
all — this is part of the engine's §2-beyond surface, not a port.

Scale plan — TWO partition exchanges total, no driver-side
data-set-sized state anywhere:
  1. hash(basket) co-partition → per-basket numpy kernel that in ONE
     pass dedups (basket, item), enumerates item pairs (the shared
     ``graph._run_pairs`` kernel — a basket with k distinct items
     emits C(k, 2) pairs, bounded by per-basket distinct-item count,
     never by data size) and emits three row kinds: co-occurrence
     pairs, per-item membership marks, one basket mark per basket
  2. one (kind, x, y) count fold — pair counts, per-item basket
     counts and the basket total all fall out of the same exchange.
  Finishing: the kind≠pair slice is LOW-CARDINALITY by contract
  (item is a category column — event types, languages, source tags);
  it collects as a dict into the score map.

Float-parity contract (DuckDB oracle twins): every score is ONE
division of exact int64 counts, rounded half-away-from-zero to 6
digits — bit-reproducible against `round(CAST(x AS DOUBLE)/y, 6)`.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

_K_PAIR, _K_ITEM, _K_BASKET = 0, 1, 2


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
    from .graph import _pair_struct, _run_pairs
    from .joins import _bucket_of

    # string item columns only (ADVICE r4): the in-partition plan marks
    # basket rows with an "" sentinel (disambiguated by `kind`, so a
    # legitimate empty-string ITEM is still counted correctly), and
    # np.full(..., "", dtype=<int dtype>) would raise an opaque
    # ValueError — fail loudly with the contract instead
    sch = ds.schema()
    if sch is not None and item in sch.names:
        ity = sch.types[sch.names.index(item)]
        if not (pa.types.is_string(ity) or pa.types.is_large_string(ity)):
            raise TypeError(
                f"pair_lift: item column {item!r} must be a string type, "
                f"got {ity} — cast it (e.g. pc.cast(..., pa.string())) "
                "upstream"
            )

    col_a, col_b = f"{item}_a", f"{item}_b"

    def add_part(batch: pa.Table) -> pa.Table:
        b = _bucket_of(batch.column(basket), num_partitions)
        return batch.select([basket, item]).append_column(
            "__p", pa.array(np.asarray(
                b.to_numpy(zero_copy_only=False), dtype=np.int32))
        )

    def emit(group: pa.Table) -> pa.Table:
        items = group.column(item).to_numpy(zero_copy_only=False)
        keys = group.column(basket).to_numpy(zero_copy_only=False)
        # factorize so the dedup/sort/pair kernel runs on int codes;
        # np.unique returns SORTED uniques, so code order == value order
        iuniq, icodes = np.unique(items, return_inverse=True)
        _, kcodes = np.unique(keys, return_inverse=True)
        s = np.unique(_pair_struct(kcodes, icodes))   # distinct + sorted
        kc, ic = s["a"], s["b"]
        left, right = _run_pairs(kc)                  # ic[l] < ic[r] in-run
        n_b = int(kc[-1]) + 1 if len(kc) else 0
        x = np.concatenate([iuniq[ic[left]], iuniq[ic],
                            np.full(n_b, "", dtype=iuniq.dtype)])
        y = np.concatenate([iuniq[ic[right]], iuniq[ic],
                            np.full(n_b, "", dtype=iuniq.dtype)])
        kind = np.concatenate([
            np.full(len(left), _K_PAIR, np.int32),
            np.full(len(ic), _K_ITEM, np.int32),
            np.full(n_b, _K_BASKET, np.int32),
        ])
        return pa.table({
            "kind": pa.array(kind, pa.int32()),
            "x": pa.array(x), "y": pa.array(y),
        })

    from .graph import _pin

    # pinned: consumed twice (meta collect + pair scoring) — without the
    # pin the second consumer re-executes the whole two-exchange plan
    folded = _pin(partition_fold(
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(emit, batch_format="pyarrow"),
        ["kind", "x", "y"], "kind", fn="count", out_val="n",
        num_partitions=num_partitions,
    ))

    import pyarrow.compute as pc

    # item-count/basket-count slice is low-cardinality by contract
    meta = folded.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("kind"),
                                        pa.scalar(_K_PAIR))),
        batch_format="pyarrow",
    )
    counts: dict[str, int] = {}
    n_baskets = 0
    for r in meta.take_all():
        if r["kind"] == _K_ITEM:
            counts[r["x"]] = int(r["n"])
        else:
            n_baskets += int(r["n"])

    from .text import _round6_half_up

    def score(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.equal(batch.column("kind"), pa.scalar(_K_PAIR)))
        a = batch.column("x").to_numpy(zero_copy_only=False)
        b = batch.column("y").to_numpy(zero_copy_only=False)
        nb = batch.column("n").to_numpy(zero_copy_only=False)
        keep = nb >= min_both
        a, b, nb = a[keep], b[keep], nb[keep]
        na = np.array([counts[v] for v in a], dtype=np.int64)
        nbb = np.array([counts[v] for v in b], dtype=np.int64)
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

    return folded.map_batches(score, batch_format="pyarrow")
