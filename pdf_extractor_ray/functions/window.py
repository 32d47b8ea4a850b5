"""Session windows — a streaming-style operator over batch data.

``sessionize`` assigns events to sessions per key: sorted by event
time, a gap larger than ``gap_seconds`` starts a new session. One hash
shuffle (groupby key) co-locates each key's events; everything inside
a group is vectorized numpy (sort, diff, cumsum, bincount) — no
per-event Python. Partitioning assumption: one key's events fit one
group (true for per-user / per-host streams; split giant keys by time
range upstream if not).

The reference has no windowing (SURVEY §2.9 — none); this extends the
engine to the sessionized-clickstream shape large-scale training-data
pipelines use for user-level dedup and activity features.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def sessionize(
    events_ds,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 86400.0,
    tiebreak: str = "event_id",
):
    """events → one row per (key, session): ``session_id`` (1-based per
    key in time order), ``n_events``, ``session_start``, ``session_end``.
    """
    gap_us = int(gap_seconds * 1_000_000)

    def sess(group: pa.Table) -> pa.Table:
        ts = (
            group.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        tb = np.asarray(group.column(tiebreak).to_pylist())
        order = np.lexsort((tb, ts))
        t = ts[order]
        brk = np.concatenate([[0], (np.diff(t) > gap_us).astype(np.int64)])
        sid = np.cumsum(brk) + 1
        n_sessions = int(sid[-1])
        counts = np.bincount(sid)[1:]
        first = np.searchsorted(sid, np.arange(1, n_sessions + 1), side="left")
        last = np.searchsorted(sid, np.arange(1, n_sessions + 1), side="right") - 1
        key_arr = group.column(key).take(pa.array([0] * n_sessions, pa.int64()))
        return pa.table(
            {
                key: key_arr,
                "session_id": pa.array(np.arange(1, n_sessions + 1), pa.int64()),
                "n_events": pa.array(counts.astype(np.int64), pa.int64()),
                "session_start": pa.array(t[first], pa.timestamp("us")),
                "session_end": pa.array(t[last], pa.timestamp("us")),
            }
        )

    return events_ds.groupby(key).map_groups(sess, batch_format="pyarrow")
