"""Whole-row set operations: INTERSECT / EXCEPT (SQL set semantics —
distinct rows), completing the §2.7 set-ops family next to the
key-based ``semi_anti_join`` and ``dedup_exact``.

Plan shape: the LEFT side reduces to DISTINCT rows (native
multi-column hash groupby — one shuffle), both sides gain a row-digest
key, and the membership test is the existing keys-only semi/anti join
— the right side ships 32-char digests only, never rows and never a
distinct shuffle (membership ignores multiplicity). At 100 TB both
inputs stream; nothing driver-side scales with data.
"""
from __future__ import annotations

from typing import Sequence

import pyarrow as pa

_SEP = "\x1f"  # unit separator: cannot appear in the str() of test keys


def _distinct(ds, cols: Sequence[str]):
    """Multi-key distinct as a partition fold (the native composite-key
    groupby measured ~5x slower — see ``agg.partition_fold``): one
    partition exchange, per-partition lexsort run-detection keeps one
    row per key combination."""
    from .agg import partition_fold

    cols = list(cols)
    keyed = ds.select_columns(cols).map_batches(
        lambda b: b.append_column(
            "__one", pa.array([1] * b.num_rows, pa.int8())
        ),
        batch_format="pyarrow",
    )
    return partition_fold(keyed, cols, "__one", fn="min").drop_columns(
        ["__one"]
    )


def _with_row_key(ds, cols: Sequence[str]):
    """Append the composite membership key ``__rk``: the columns cast
    to string and joined on the unit separator — three Arrow kernels
    per column, no per-row Python (round 5 replaced the hashlib.md5
    row loop, which was the last per-row hot path in the set-op
    family; the joined key is also SHORTER than a 32-char digest for
    these schemas, so the keys-only side ships less).  Collision-free
    by the same contract as before: ``\\x1f`` cannot appear in the
    stringified key columns."""
    import pyarrow.compute as pc

    cols = list(cols)

    def add(batch: pa.Table) -> pa.Table:
        parts = [
            pc.fill_null(pc.cast(batch.column(c), pa.string()), "\x00")
            for c in cols
        ]
        key = (
            parts[0]
            if len(parts) == 1
            else pc.binary_join_element_wise(*parts, _SEP)
        )
        return batch.append_column("__rk", pc.cast(key, pa.string()))

    return ds.map_batches(add, batch_format="pyarrow")


def intersect_distinct(a_ds, b_ds, cols: Sequence[str],
                       num_partitions: int = 32):
    """SQL ``INTERSECT``: distinct rows of A that also appear in B."""
    return _set_op(a_ds, b_ds, cols, "semi", num_partitions)


def except_distinct(a_ds, b_ds, cols: Sequence[str],
                    num_partitions: int = 32):
    """SQL ``EXCEPT``: distinct rows of A that do NOT appear in B."""
    return _set_op(a_ds, b_ds, cols, "anti", num_partitions)


def _set_op(a_ds, b_ds, cols, how, num_partitions):
    from .joins import semi_anti_join

    cols = list(cols)
    a_keyed = _with_row_key(_distinct(a_ds, cols), cols)
    # B needs no distinct pass: membership ignores multiplicity and the
    # join ships only digests — skipping it saves B's groupby shuffle
    b_keyed = _with_row_key(b_ds, cols)
    return semi_anti_join(
        a_keyed,
        b_keyed.select_columns(["__rk"]),
        "__rk",
        "__rk",
        left_cols=cols,
        how=how,
        num_partitions=num_partitions,
    )
