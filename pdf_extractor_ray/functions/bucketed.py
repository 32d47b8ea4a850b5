"""Bucketed (co-partitioned) storage: write tables hash-bucketed by a
key once, then join them SHUFFLE-FREE forever after.

The classic at-scale layout optimization (Hive/Spark bucketed tables,
`CLUSTER BY`): both sides of a recurring join are written with rows
hash-partitioned into ``bucket=i/`` directories by the SAME hash of
the join key.  A later join then never exchanges rows — each task
reads bucket ``i`` of both sides (a pruned, co-located read) and joins
in place.  For a 100-TB fact table joined every run against a rolling
dimension, the exchange is paid once at write time, not per query.

- :func:`write_bucketed` needs NO shuffle either: every input block
  splits its own rows by bucket and appends a distinctly-named file
  under each ``bucket=i/`` directory (filename = content hash of the
  whole block → idempotent re-runs, same convention as the WET sink;
  stale parts from prior runs are cleared at write start).
- :func:`bucketed_join` maps over bucket IDS (one row each), so Ray
  schedules B independent co-bucketed joins with no all-to-all stage.
- Bucketing uses :func:`joins._bucket_of` — the same vectorized
  splitmix64 / buffer-polynomial hash as the shuffle-join family, so a
  bucketed table can also feed those operators consistently.
"""
from __future__ import annotations

import glob
import hashlib
import os
from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa

from .joins import _bucket_of


def write_bucketed(ds, key_col: str, out_dir: str, num_buckets: int = 32,
                   append: bool = False):
    """Dataset → ``out_dir/bucket=i/part-<hash>.parquet`` with rows
    hash-bucketed by ``key_col``; NO shuffle (per-block split-append).
    Returns the written manifest Dataset ``(bucket, path, n_rows)`` —
    consume it to force the write.

    Filenames hash the FULL block contents (every column), so two
    blocks with identical key sequences but different payloads never
    collide; pre-existing ``part-*.parquet`` files are cleared at
    plan-build time so a re-run with different block boundaries can't
    leave stale parts mixed into the bucket dirs.  ``append=True``
    keeps existing parts (incremental index growth — e.g. ingesting a
    deduped recrawl batch into a live LSH index); the content-hash
    filenames make re-appending the same blocks idempotent."""
    import pyarrow.parquet as pq

    for i in range(num_buckets):
        d = os.path.join(out_dir, f"bucket={i}")
        os.makedirs(d, exist_ok=True)
        if not append:
            for stale in glob.glob(os.path.join(d, "part-*.parquet")):
                os.remove(stale)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "path": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64())})
        b = _bucket_of(batch.column(key_col), num_buckets)
        # content hash of the WHOLE block via Arrow IPC bytes —
        # C-level serialization, no per-value Python formatting
        import io

        import pyarrow.ipc as _ipc

        buf = io.BytesIO()
        with _ipc.new_stream(buf, batch.schema) as w:
            w.write_table(batch)
        digest = hashlib.md5(buf.getvalue()).hexdigest()[:16]
        batch = batch.append_column("__bkt", b)
        buckets, paths, rows = [], [], []
        bnp = np.asarray(b.to_numpy(zero_copy_only=False))
        for i in np.unique(bnp):
            part = batch.filter(pa.array(bnp == i)).drop_columns(["__bkt"])
            path = os.path.join(out_dir, f"bucket={int(i)}",
                                f"part-{digest}.parquet")
            tmp = path + ".tmp"
            pq.write_table(part, tmp)
            os.replace(tmp, path)  # atomic publish, idempotent name
            buckets.append(int(i))
            paths.append(path)
            rows.append(part.num_rows)
        return pa.table({"bucket": pa.array(buckets, pa.int32()),
                         "path": pa.array(paths, pa.string()),
                         "n_rows": pa.array(rows, pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow")


class _BucketJoiner:
    """Actor: bucket id → joined rows of that bucket (both sides read
    locally; vectorized sort-merge within the bucket)."""

    def __init__(self, left_dir: str, right_dir: str, key_col: str,
                 right_key: Optional[str], left_cols: Sequence[str],
                 right_cols: Sequence[str], how: str = "inner") -> None:
        self.left_dir = left_dir
        self.right_dir = right_dir
        self.key = key_col
        self.rkey = right_key or key_col
        self.left_cols = list(left_cols)
        self.right_cols = list(right_cols)
        self.how = how
        # discover side schemas ONCE per actor so null fills and empty
        # outputs are TYPED — every bucket task must emit an identical
        # schema or the downstream union of block outputs breaks
        self.left_types = self._dir_types(left_dir)
        self.right_types = self._dir_types(right_dir)

    @staticmethod
    def _dir_types(dirpath: str) -> dict:
        import pyarrow.parquet as pq

        files = glob.glob(os.path.join(dirpath, "bucket=*", "*.parquet"))
        if not files:
            return {}
        schema = pq.read_schema(sorted(files)[0])
        return {name: schema.field(name).type for name in schema.names}

    def _null_col(self, col: str, n: int) -> pa.Array:
        t = self.right_types.get(col)
        return pa.nulls(n, t) if t is not None else pa.nulls(n)

    @staticmethod
    def _read(dirpath: str, bucket: int, cols: List[str]) -> pa.Table:
        import pyarrow.parquet as pq

        files = sorted(glob.glob(
            os.path.join(dirpath, f"bucket={bucket}", "*.parquet")))
        if not files:
            return None
        return pa.concat_tables([pq.read_table(f, columns=cols) for f in files])

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        schema = None
        for bucket in batch.column("bucket").to_pylist():
            l = self._read(self.left_dir, bucket,
                           sorted({*self.left_cols, self.key}))
            r = self._read(self.right_dir, bucket,
                           sorted({*self.right_cols, self.rkey}))
            if l is None or not l.num_rows:
                continue
            if r is None or not r.num_rows:
                if self.how != "left":
                    continue
                cols = {c: l.column(c) for c in self.left_cols}
                for c in self.right_cols:
                    cols[c] = self._null_col(c, l.num_rows)
                out.append(pa.table(cols))
                continue
            lk = l.column(self.key).to_numpy(zero_copy_only=False)
            rk = r.column(self.rkey).to_numpy(zero_copy_only=False)
            order = np.argsort(rk, kind="stable")
            rk_s = rk[order]
            lo = np.searchsorted(rk_s, lk, side="left")
            hi = np.searchsorted(rk_s, lk, side="right")
            cnt = hi - lo
            l_idx = np.repeat(np.arange(len(lk)), cnt)
            r_idx = np.concatenate(
                [order[a:b] for a, b in zip(lo, hi) if b > a]
            ) if cnt.sum() else np.zeros(0, dtype=np.int64)
            r_valid = np.ones(len(r_idx), dtype=bool)
            if self.how == "left":
                # unmatched left rows once, with null right columns
                miss = np.nonzero(cnt == 0)[0]
                l_idx = np.concatenate([l_idx, miss])
                r_idx = np.concatenate([r_idx, np.zeros(len(miss), np.int64)])
                r_valid = np.concatenate(
                    [r_valid, np.zeros(len(miss), dtype=bool)])
            cols = {}
            for c in self.left_cols:
                cols[c] = l.column(c).take(pa.array(l_idx))
            for c in self.right_cols:
                taken = r.column(c).take(pa.array(r_idx))
                if not r_valid.all():
                    taken = pa.chunked_array([taken.combine_chunks()]).combine_chunks()
                    taken = pc_if_else_valid(taken, r_valid)
                cols[c] = taken
            t = pa.table(cols)
            schema = t.schema
            out.append(t)
        if not out:
            cols = {}
            for c in self.left_cols:
                t = self.left_types.get(c)
                cols[c] = pa.array([], t) if t is not None else pa.array([])
            for c in self.right_cols:
                t = self.right_types.get(c)
                cols[c] = pa.array([], t) if t is not None else pa.array([])
            return pa.table(cols)
        return pa.concat_tables(out)


def pc_if_else_valid(arr: pa.Array, valid: np.ndarray) -> pa.Array:
    """Null out positions where ``valid`` is False (left-join fill)."""
    import pyarrow.compute as pc

    return pc.if_else(pa.array(valid), arr, pa.nulls(len(arr), arr.type))


def bucketed_join(left_dir: str, right_dir: str, key_col: str,
                  left_cols: Sequence[str], right_cols: Sequence[str],
                  right_key: Optional[str] = None, num_buckets: int = 32,
                  how: str = "inner",
                  concurrency: Optional[int] = None):
    """Inner-join two bucketed tables WITHOUT any exchange: a Dataset
    of bucket ids fans out to tasks that each read + join ONE
    co-located bucket pair.  Both tables must have been written by
    :func:`write_bucketed` with the same ``num_buckets`` (and the same
    key hashing, which write_bucketed guarantees)."""
    import ray.data

    from .pool import pool_size

    ids = ray.data.from_arrow(
        pa.table({"bucket": pa.array(range(num_buckets), pa.int32())})
    ).repartition(num_buckets)
    return ids.map_batches(
        _BucketJoiner,
        fn_constructor_kwargs={
            "left_dir": left_dir, "right_dir": right_dir,
            "key_col": key_col, "right_key": right_key,
            "left_cols": left_cols, "right_cols": right_cols,
            "how": how,
        },
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency or pool_size(),
    )


class _BucketAggregator:
    """Actor: bucket id → FINAL aggregates of that bucket.  Because a
    bucket holds every row of its keys, per-bucket groupby results are
    already global — aggregation without any exchange."""

    def __init__(self, dirpath: str, key_col: str,
                 aggs: Sequence[tuple]) -> None:
        self.dir = dirpath
        self.key = key_col
        self.aggs = list(aggs)

    def _agg(self, t: pa.Table) -> pa.Table:
        res = t.group_by(self.key).aggregate(
            [(c, f) for c, f, _o in self.aggs]
        )
        return res.rename_columns(
            [self.key] + [o for _c, _f, o in self.aggs]
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc  # noqa: F401 (group_by kernels)

        out = []
        cols = sorted({self.key, *(c for c, _f, _o in self.aggs)})
        for bucket in batch.column("bucket").to_pylist():
            t = _BucketJoiner._read(self.dir, bucket, cols)
            if t is None or not t.num_rows:
                continue
            out.append(self._agg(t))
        if not out:
            # TYPED empty output: run the same aggregate over a typed
            # zero-row table so every bucket task's schema is identical
            types = _BucketJoiner._dir_types(self.dir)
            if types:
                empty = pa.table(
                    {c: pa.array([], types[c]) for c in cols if c in types}
                )
                return self._agg(empty)
            names = [self.key] + [o for _c, _f, o in self.aggs]
            return pa.table({n: [] for n in names})
        return pa.concat_tables(out)


def bucketed_groupby(dirpath: str, key_col: str, aggs: Sequence[tuple],
                     num_buckets: int = 32,
                     concurrency: Optional[int] = None):
    """Exchange-free grouped aggregation over a bucketed table:
    ``aggs`` is ``[(col, fn, out_name), ...]`` with pyarrow group_by
    fns ('sum', 'count', 'min', 'max', 'mean').  Each task aggregates
    one bucket and its partials ARE the final rows (keys never span
    buckets)."""
    import ray.data

    from .pool import pool_size

    ids = ray.data.from_arrow(
        pa.table({"bucket": pa.array(range(num_buckets), pa.int32())})
    ).repartition(num_buckets)
    return ids.map_batches(
        _BucketAggregator,
        fn_constructor_kwargs={
            "dirpath": dirpath, "key_col": key_col, "aggs": aggs,
        },
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency or pool_size(),
    )
