"""Distributed as-of join — an operator Ray Data lacks natively.

Semantics: for every left row, attach the right row with the same key
and the LATEST right timestamp ≤ the left timestamp (ties broken by
the largest tiebreak column value — deterministic), left-outer.

Distribution: both sides are mapped into one common layout and grouped
by join key — the single unavoidable shuffle co-locates each key's
rows; within a group the match is vectorized (sort + searchsorted),
so per-group work is O(n log n) numpy, not per-row Python. Partitioning
assumption: one key's rows fit in one group (true for per-user /
per-host streams; salt hot keys upstream if a single key is huge).

Reference has no distributed joins (SURVEY §2.4 — all doc-local);
this generalizes the engine to time-series enrichment workloads.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa


def asof_join(
    left_ds,
    right_ds,
    key: str,
    left_ts: str,
    right_ts: str,
    right_tiebreak: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
):
    """Left-outer as-of join. Output columns: ``left_cols`` +
    ``right_cols`` (nullable where no right row qualifies)."""
    left_cols = list(left_cols)
    right_cols = list(right_cols)

    # schema derivation on the driver (cheap metadata call)
    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_types = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: t for n, t in zip(r_schema.names, r_schema.types)}
    fields = [pa.field("__key", pa.int64()), pa.field("__ts", pa.timestamp("us")),
              pa.field("__side", pa.int8())]
    fields += [pa.field(f"l_{c}", l_types[c]) for c in left_cols]
    fields += [pa.field(f"r_{c}", r_types[c]) for c in right_cols]
    fields.append(pa.field("__tb", pa.int64()))
    schema = pa.schema(fields)

    def to_common(side: int, ts_col: str, cols: List[str], prefix: str, tb: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            arrays = {
                "__key": batch.column(key).cast(pa.int64()),
                "__ts": batch.column(ts_col).cast(pa.timestamp("us")),
                "__side": pa.array([side] * n, pa.int8()),
            }
            for f in schema:
                if f.name.startswith("l_"):
                    c = f.name[2:]
                    arrays[f.name] = (
                        batch.column(c) if side == 0 and c in batch.column_names
                        else pa.nulls(n, f.type)
                    )
                elif f.name.startswith("r_"):
                    c = f.name[2:]
                    arrays[f.name] = (
                        batch.column(c) if side == 1 and c in batch.column_names
                        else pa.nulls(n, f.type)
                    )
            arrays["__tb"] = (
                batch.column(tb).cast(pa.int64()) if side == 1
                else pa.array([0] * n, pa.int64())
            )
            return pa.table(arrays, schema=schema)

        return fn

    both = left_ds.map_batches(
        to_common(0, left_ts, left_cols, "l_", right_tiebreak), batch_format="pyarrow"
    ).union(
        right_ds.map_batches(
            to_common(1, right_ts, right_cols, "r_", right_tiebreak),
            batch_format="pyarrow",
        )
    )

    out_fields = [pa.field(c, l_types[c]) for c in left_cols]
    out_fields += [pa.field(c, r_types[c]) for c in right_cols]
    out_schema = pa.schema(out_fields)

    def match_group(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("__side").to_pylist(), dtype=np.int8)
        ts = np.asarray(group.column("__ts").cast(pa.int64()).to_pylist(), dtype=np.int64)
        tb = np.asarray(group.column("__tb").to_pylist(), dtype=np.int64)
        l_idx = np.nonzero(side == 0)[0]
        r_idx = np.nonzero(side == 1)[0]
        if len(l_idx) == 0:
            return out_schema.empty_table()
        lefts = group.take(pa.array(l_idx))
        if len(r_idx) == 0:
            cols = {c: lefts.column(f"l_{c}") for c in left_cols}
            for c in right_cols:
                cols[c] = pa.nulls(len(l_idx), out_schema.field(c).type)
            return pa.table(cols, schema=out_schema)
        # sort right side by (ts, tiebreak) — searchsorted then walks back
        order = np.lexsort((tb[r_idx], ts[r_idx]))
        r_sorted = r_idx[order]
        r_ts = ts[r_sorted]
        pos = np.searchsorted(r_ts, ts[l_idx], side="right") - 1
        has = pos >= 0
        take_r = np.where(has, r_sorted[np.clip(pos, 0, None)], -1)
        rights = group.take(pa.array(np.clip(take_r, 0, None), pa.int64()))
        cols = {c: lefts.column(f"l_{c}") for c in left_cols}
        has_arr = pa.array(has)
        import pyarrow.compute as pc

        for c in right_cols:
            matched = rights.column(f"r_{c}")
            cols[c] = pc.if_else(
                has_arr, matched, pa.nulls(len(l_idx), out_schema.field(c).type)
            )
        return pa.table(cols, schema=out_schema)

    return both.groupby("__key").map_groups(match_group, batch_format="pyarrow")
