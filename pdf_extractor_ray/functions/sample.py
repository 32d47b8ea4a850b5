"""Deterministic hash-based sampling.

At 100 TB you never sample with a RNG: a hash-of-key predicate gives a
sample that is (a) reproducible across runs and retries (a re-executed
task keeps the same rows — required for resumable pipelines), (b)
consistent across tables (sampling documents and their embeddings by
the same key keeps them aligned), and (c) pushable to the read — the
filter runs inside ``map_batches`` right after the scan, so non-sample
rows never leave the first stage.

The predicate is the first hex digit of ``md5(str(key))``: uniform,
process-stable, and expressible in ANSI SQL (``substr(md5(..),1,1)``)
so the sample is oracle-checkable. md5 here is a partitioner, not
security. The reference has no sampling (single-document CLI); this is
engine-side infrastructure for corpus-scale work.
"""
from __future__ import annotations

import hashlib

import pyarrow as pa

_HEX = "0123456789abcdef"


def hash_sample(ds, col: str, keep: int = 2, out_of: int = 16):
    """Keep rows whose ``md5(str(row[col]))`` first hex digit is one of
    the first ``keep`` of ``out_of`` (must be 16) — a keep/16 sample,
    deterministic in the key value alone."""
    if out_of != 16 or not (0 < keep <= 16):
        raise ValueError("hash_sample: out_of must be 16 and 0 < keep <= 16")
    allowed = frozenset(_HEX[:keep])

    def pick(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        mask = pa.array(
            [
                v is not None
                and hashlib.md5(str(v).encode()).hexdigest()[0] in allowed
                for v in vals
            ]
        )
        return batch.filter(mask)

    return ds.map_batches(pick, batch_format="pyarrow")


def fixed_sample(ds, key_col: str, n: int):
    """EXACTLY-n deterministic global sample: the n rows ranking first
    by ``(md5(str(key)), key)`` — SQL ``ORDER BY md5(..) LIMIT n``.

    Unlike a rate sample (``hash_sample``) the output size is fixed,
    and unlike a RNG reservoir it is reproducible and merge-friendly:
    top-n-by-rank is ASSOCIATIVE, so each block emits only its local
    top n (blocks×n rows total shuffle) and a final head pass picks
    the global n. No full sort, no corpus materialization.
    """
    import heapq

    def local_top(batch: pa.Table) -> pa.Table:
        ranks = [
            hashlib.md5(str(v).encode()).hexdigest()
            for v in batch.column(key_col).to_pylist()
        ]
        keep = heapq.nsmallest(
            n, range(len(ranks)),
            key=lambda i: (ranks[i], batch.column(key_col)[i].as_py()),
        )
        out = batch.take(pa.array(sorted(keep), pa.int64()))
        return out.append_column(
            "__rank",
            pa.array([ranks[i] for i in sorted(keep)], pa.string()),
        )

    partials = ds.map_batches(local_top, batch_format="pyarrow")
    # final head over blocks×n candidate rows — tiny by construction
    return (
        partials.sort(["__rank", key_col])
        .limit(n)
        .drop_columns(["__rank"])
    )


def stratified_sample(ds, group_col: str, key_col: str, n_per_group: int):
    """Deterministic stratified sample: the ``n_per_group`` rows per
    group that rank first by ``(md5(str(key)), key)`` — a fixed,
    reproducible pseudo-random order expressible in SQL
    (``row_number() OVER (PARTITION BY g ORDER BY md5(..), key)``).

    The balanced-per-class sampling a training-data pipeline needs
    (equal docs per language, per source, ...). One hash shuffle on
    the group key; in-group selection is a lexsort + head. The md5
    rank column is computed per batch before the shuffle and dropped
    after, so the shuffle payload grows by one 32-char column only.
    """
    import numpy as np

    def add_rank(batch: pa.Table) -> pa.Table:
        ranks = [
            hashlib.md5(str(v).encode()).hexdigest()
            for v in batch.column(key_col).to_pylist()
        ]
        return batch.append_column("__rank", pa.array(ranks, pa.string()))

    def head(group: pa.Table) -> pa.Table:
        r = np.asarray(group.column("__rank").to_pylist())
        k = np.asarray(group.column(key_col).to_pylist())
        order = np.lexsort((k, r))[:n_per_group]
        return group.take(pa.array(order, pa.int64())).drop_columns(["__rank"])

    return (
        ds.map_batches(add_rank, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(head, batch_format="pyarrow")
    )


def weighted_sample(ds, key_col: str, weight_col: str, n: int):
    """EXACTLY-n weighted sample without replacement — the
    Efraimidis–Spirakis A-ES scheme (IPL 2006): each row gets rank
    ``-ln(u)/w`` with u a DETERMINISTIC uniform from ``md5(str(key))``
    (first 13 hex digits / 2^52, never 0) and the n smallest ranks win,
    which draws rows with probability proportional to ``weight_col``.

    Deterministic and SQL-mirrorable (DuckDB parses the same hex
    prefix), reproducible across retries, and ASSOCIATIVE like
    :func:`fixed_sample`: each block ships only its local top-n
    (blocks×n rows total), a final head picks the global n — no full
    sort, no corpus materialization. Weights are clamped to ≥1
    (zero/negative weights would blow up the transform; clamp in the
    SQL twin too).
    """
    import heapq
    import math

    _DENOM = float((1 << 52) + 1)

    def local_top(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        ws = batch.column(weight_col).to_pylist()
        ranks = []
        for k, w in zip(keys, ws):
            h = int(hashlib.md5(str(k).encode()).hexdigest()[:13], 16)
            u = (h + 1) / _DENOM
            ranks.append(-math.log(u) / max(float(w or 0), 1.0))
        keep = heapq.nsmallest(
            n, range(len(ranks)), key=lambda i: (ranks[i], keys[i])
        )
        out = batch.take(pa.array(sorted(keep), pa.int64()))
        return out.append_column(
            "__rank", pa.array([ranks[i] for i in sorted(keep)], pa.float64())
        )

    partials = ds.map_batches(local_top, batch_format="pyarrow")
    return (
        partials.sort(["__rank", key_col])
        .limit(n)
        .drop_columns(["__rank"])
    )


def shard_assign(ds, key_col: str, n_shards: int, seed: str = ""):
    """Deterministic training-shard assignment: every row gets
    ``shard`` (int64 in [0, n_shards)) and ``pos`` (int64 in-shard sort
    key) derived from ``md5(f"{seed}:{key}")`` — hex digits 1-8 pick
    the shard, digits 9-21 the position.

    This is the 100-TB replacement for ``Dataset.random_shuffle()``:
    a true random shuffle is an all-to-all sort of the ENTIRE corpus
    with non-reproducible placement, while a hash shuffle is (a)
    reproducible across runs/retries (a resumed job rebuilds the same
    shards — required for checkpointed training-data jobs), (b)
    seed-rotatable (new ``seed`` → statistically independent
    permutation, the per-epoch reshuffle), and (c) SQL-mirrorable, so
    the whole permutation is oracle-checkable. md5 is a partitioner
    here, not security."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")

    def assign(batch: pa.Table) -> pa.Table:
        shards, poss = [], []
        for v in batch.column(key_col).to_pylist():
            h = hashlib.md5(f"{seed}:{v}".encode()).hexdigest()
            shards.append(int(h[:8], 16) % n_shards)
            poss.append(int(h[8:21], 16))
        batch = batch.append_column("shard", pa.array(shards, pa.int64()))
        return batch.append_column("pos", pa.array(poss, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def train_shuffle(ds, key_col: str, n_shards: int, seed: str = ""):
    """Globally shuffled, shard-clustered dataset: rows are hash-
    assigned to shards (:func:`shard_assign`), ONE hash shuffle
    co-locates each shard, and each shard is ordered by (pos, key)
    with an in-group lexsort — no corpus-wide sort. Consume with
    ``write_parquet`` for one directory-per-shard resumable layout, or
    ``iter_batches`` for direct training ingestion."""
    import numpy as np

    assigned = shard_assign(ds, key_col, n_shards, seed)

    def order(group: pa.Table) -> pa.Table:
        pos = group.column("pos").to_numpy(zero_copy_only=False)
        keys = np.asarray(group.column(key_col).to_pylist())
        take = np.lexsort((keys, pos))
        return group.take(pa.array(take, pa.int64()))

    return assigned.groupby("shard").map_groups(order, batch_format="pyarrow")


def repeat_rows(ds, times_col: str, max_repeat: int = 1000,
                out_col: str = "copy_idx"):
    """Integer row replication — the epoch-upsampling / data-mixing
    primitive (emit row k times where k = ``times_col``, with
    ``out_col`` numbering the copies 0..k-1). Zero shuffle: each batch
    expands in place with one ``np.repeat`` take plus arange-cumsum
    copy indices; k=0 rows drop (downweighting to exclusion).

    ``max_repeat`` is a LOUD contract, not a silent clamp: a corrupt
    weight column multiplying the corpus 10^6× should fail the stage,
    not OOM the cluster."""
    import numpy as np

    def expand(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column(times_col).to_pylist(), dtype=np.int64)
        if len(k) and k.max() > max_repeat:
            raise ValueError(
                f"repeat_rows: weight {k.max()} exceeds max_repeat="
                f"{max_repeat}; raise the cap explicitly if intended"
            )
        k = np.clip(k, 0, None)
        tot = int(k.sum())
        idx = np.repeat(np.arange(len(k)), k)
        out = batch.take(pa.array(idx, pa.int64()))
        cum = np.concatenate([[0], np.cumsum(k)])
        copy_idx = np.arange(tot) - np.repeat(cum[:-1], k)
        return out.append_column(out_col, pa.array(copy_idx, pa.int64()))

    return ds.map_batches(expand, batch_format="pyarrow")
