"""Persisted MinHash-LSH index for INCREMENTAL near-dup detection.

The recrawl workflow at corpus scale: deduping each new crawl batch
against the full historical corpus must not recompute (or even
re-read) the historical side.  The index is the classic two-table
layout every production near-dup system persists (CCNet / RefinedWeb
recrawl dedup; the bucketed-storage trick from Hive/Spark
``CLUSTER BY``):

- ``bands/``    — (bucket_key, doc_id) band rows, hash-bucketed by
  ``bucket_key`` (``bucketed.write_bucketed``), with non-discriminative
  boilerplate band keys (> ``max_bucket`` members) dropped at build
  time via a keys-only anti-join — no driver structure, the hot-key
  fix the MinHash family already uses.
- ``shingles/`` — (doc_id, shingles:list<uint32>) verification sets,
  hash-bucketed by ``doc_id`` so the query side can read ONLY the
  bucket dirs that contain candidate ids.
- ``meta.json`` — the signature parameters; the query side refuses a
  seed/band mismatch loudly instead of silently missing every dup.

Query plan (per new batch): band the batch with the stored seed
(task-based, worker-global warm state) → write its band rows bucketed
to a per-process scratch dir → ONE ``bucketed_join`` fans out over
co-located bucket-dir pairs (ZERO exchange over the historical
corpus) → the raw candidate id pairs are pulled once to the driver
and numpy-deduped (the ``candidate_shingles`` contract: 16 B/pair,
∝ near-dup count, never corpus-sized — the pairs ARE the query output
modulo the verify filter) → old shingle sets read from candidate
bucket dirs only with a broadcast-id membership filter → new shingle
sets from a candidate-filtered pass over the batch → two hash joins
attach both sets → vectorized exact-Jaccard verify.

Recall contract: identical signature scheme and seed as
``minhash_lsh_candidates`` (recall 1.0 at the pinned seed/threshold is
a per-pair property of the signatures, so it holds across the
old/new split); verification is exact, so precision is exact.

Reference: the reference repo has no index surface (single-document
CLI, reference `main.py`); this is engine-side infrastructure for the
100-TB recrawl loop.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pyarrow as pa

from .bucketed import bucketed_join, write_bucketed
from .dedup import MinHashBandStage, _word_shingles, compact_blocks
from .joins import _bucket_of, hash_join, semi_anti_join


_BAND_STAGES: dict = {}


def _band_fn(n_perm: int, bands: int, seed: int):
    """Task-based band stage with worker-global warm state: the
    MinHasher coefficients build once per (params) per worker process
    (the repo's worker-globals pattern) — an autoscaling ACTOR pool
    pays ~2-4 s of spin-up per stage at batch scale for state this
    cheap, tasks pay none."""

    def f(batch: pa.Table) -> pa.Table:
        key = (n_perm, bands, seed)
        stage = _BAND_STAGES.get(key)
        if stage is None:
            stage = MinHashBandStage(n_perm=n_perm, bands=bands, seed=seed)
            _BAND_STAGES[key] = stage
        return stage(batch)

    return f


def _shingle_stage(k: int):
    def shingle_batch(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column("text").to_pylist():
            out.append(sorted(_word_shingles(t or "", k)))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shingles": pa.array(out, pa.list_(pa.uint32())),
            }
        )

    return shingle_batch


def build_lsh_index(docs_ds, index_dir: str, *, n_perm: int = 64,
                    bands: int = 16, seed: int = 42, k: int = 3,
                    num_buckets: int = 32, max_bucket: int = 4096) -> dict:
    """Build the persisted index from the historical corpus.  Two
    corpus passes (band + shingle), two bucketed writes (no shuffle),
    plus one band-key count exchange to drop boilerplate keys.
    Returns {n_band_rows, n_docs} (manifest consumption forces the
    writes)."""
    from .agg import partition_fold

    band_rows = compact_blocks(docs_ds.map_batches(
        _band_fn(n_perm, bands, seed), batch_format="pyarrow",
    ))
    # boilerplate gate: a band signature shared by > max_bucket docs is
    # non-discriminative and would cost O(n_new·n_old) rows in one
    # bucket-join task; dropped here once so every future query is safe.
    counts = partition_fold(
        band_rows.map_batches(
            lambda b: b.append_column(
                "__one", pa.array(np.ones(b.num_rows, np.int64))),
            batch_format="pyarrow",
        ),
        ["bucket_key"], "__one", fn="sum", out_val="n",
    )
    hot = counts.filter(expr=f"n > {max_bucket}")
    kept = semi_anti_join(
        band_rows, hot.select_columns(["bucket_key"]),
        "bucket_key", "bucket_key",
        left_cols=["bucket_key", "doc_id"], how="anti",
    )
    n_band_rows = sum(
        r["n_rows"] for r in write_bucketed(
            kept, "bucket_key", os.path.join(index_dir, "bands"),
            num_buckets,
        ).iter_rows()
    )
    sh = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        _shingle_stage(k), batch_format="pyarrow"
    )
    n_docs = sum(
        r["n_rows"] for r in write_bucketed(
            sh, "doc_id", os.path.join(index_dir, "shingles"), num_buckets,
        ).iter_rows()
    )
    meta = {"n_perm": n_perm, "bands": bands, "seed": seed, "k": k,
            "num_buckets": num_buckets, "max_bucket": max_bucket,
            "n_docs": n_docs, "n_band_rows": n_band_rows}
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))
    return meta


def append_lsh_index(new_docs_ds, index_dir: str) -> dict:
    """Ingest a (deduped) batch into the live index — the step after
    :func:`query_lsh_index` in the recrawl loop: survivors join the
    historical corpus so the NEXT batch dedups against them too.  Band
    rows and shingle sets are appended to the existing bucket dirs
    (``write_bucketed(append=True)`` — content-hash part names, so
    re-appending the same blocks is idempotent); the boilerplate gate
    is applied WITHIN the batch (a key exceeding ``max_bucket`` inside
    one batch is boilerplate by itself) — the exact global gate
    re-applies on the next full rebuild.  Meta counts update
    atomically."""
    from .agg import partition_fold

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    nb = meta["num_buckets"]
    band_rows = compact_blocks(new_docs_ds.map_batches(
        _band_fn(meta["n_perm"], meta["bands"], meta["seed"]),
        batch_format="pyarrow",
    ))
    counts = partition_fold(
        band_rows.map_batches(
            lambda b: b.append_column(
                "__one", pa.array(np.ones(b.num_rows, np.int64))),
            batch_format="pyarrow",
        ),
        ["bucket_key"], "__one", fn="sum", out_val="n",
    )
    hot = counts.filter(expr=f"n > {meta['max_bucket']}")
    kept = semi_anti_join(
        band_rows, hot.select_columns(["bucket_key"]),
        "bucket_key", "bucket_key",
        left_cols=["bucket_key", "doc_id"], how="anti",
    )
    n_band_rows = sum(
        r["n_rows"] for r in write_bucketed(
            kept, "bucket_key", os.path.join(index_dir, "bands"), nb,
            append=True,
        ).iter_rows()
    )
    sh = new_docs_ds.select_columns(["doc_id", "text"]).map_batches(
        _shingle_stage(meta["k"]), batch_format="pyarrow"
    )
    n_docs = sum(
        r["n_rows"] for r in write_bucketed(
            sh, "doc_id", os.path.join(index_dir, "shingles"), nb,
            append=True,
        ).iter_rows()
    )
    meta["n_docs"] += n_docs
    meta["n_band_rows"] += n_band_rows
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))
    return meta


def query_lsh_index(new_docs_ds, index_dir: str, *,
                    threshold: float = 0.5,
                    scratch_dir: Optional[str] = None):
    """New batch → (new_doc_id, old_doc_id, jaccard) near-dup pairs vs
    the indexed corpus, jaccard ≥ ``threshold``, exact-verified.  The
    historical corpus is touched only through co-located bucket reads:
    band dirs in the bucketed join, shingle dirs pruned to candidate
    buckets."""
    import tempfile

    import pyarrow.compute as pc
    import ray
    import ray.data

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    nb = meta["num_buckets"]
    scratch = scratch_dir or tempfile.mkdtemp(prefix="lshq-")

    new_bands = new_docs_ds.map_batches(
        _band_fn(meta["n_perm"], meta["bands"], meta["seed"]),
        batch_format="pyarrow",
    ).map_batches(
        lambda b: b.rename_columns(["bucket_key", "new_doc_id"]),
        batch_format="pyarrow",
    )
    for _ in write_bucketed(
        new_bands, "bucket_key", os.path.join(scratch, "bands"), nb
    ).iter_rows():
        pass

    cand = bucketed_join(
        os.path.join(scratch, "bands"),
        os.path.join(index_dir, "bands"),
        "bucket_key",
        left_cols=["new_doc_id"], right_cols=["doc_id"],
        num_buckets=nb,
        concurrency=(1, 8),  # nb tiny co-located joins; a full-width
        # actor pool costs more spin-up than the joins themselves
    )
    out_schema = pa.schema([
        pa.field("new_doc_id", pa.int64()), pa.field("old_doc_id", pa.int64()),
        pa.field("jaccard", pa.float64()),
    ])
    # ONE driver pull of the raw candidate ID pairs (the established
    # candidate_shingles contract: 16 B/pair, ∝ near-dup count, never
    # corpus-sized — the pairs ARE the query output modulo the verify
    # filter): pair dedup happens HERE in one numpy unique instead of
    # a dedicated partition exchange, and the same pull feeds the
    # empty check, the shingle-dir pruning and both id broadcasts.
    id_blocks = [
        t for t in (ray.get(r) for r in cand.to_arrow_refs())
        if t.num_rows
    ]
    if not id_blocks:
        return ray.data.from_arrow(out_schema.empty_table())
    ids_t = pa.concat_tables(id_blocks)
    raw = np.stack([
        ids_t.column("new_doc_id").to_numpy(zero_copy_only=False),
        ids_t.column("doc_id").to_numpy(zero_copy_only=False),
    ], axis=1)
    uniq = np.unique(raw, axis=0)
    pairs = ray.data.from_arrow(pa.table({
        "new_doc_id": pa.array(uniq[:, 0], pa.int64()),
        "doc_id": pa.array(uniq[:, 1], pa.int64()),
    }))
    old_id_arr = np.unique(uniq[:, 1])
    new_id_arr = np.unique(uniq[:, 0])

    # old shingles: read ONLY the bucket dirs holding candidate old ids
    # (≤ num_buckets dirs), then a broadcast-id membership filter — no
    # exchange (the id set is the same candidate-sized broadcast the
    # MinHash family's candidate_shingles uses).
    cand_buckets = sorted({
        int(x) for x in _bucket_of(
            pa.chunked_array([pa.array(old_id_arr, pa.int64())]), nb
        ).to_pylist()
    })
    import glob as _glob

    shard_paths = [
        p for i in cand_buckets
        for p in sorted(_glob.glob(os.path.join(
            index_dir, "shingles", f"bucket={i}", "part-*.parquet")))
    ]
    old_ref = ray.put(old_id_arr.astype(np.int64))

    def old_filter(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("doc_id"),
                        value_set=pa.array(ray.get(old_ref), pa.int64()))
        return batch.filter(keep)

    old_sh = ray.data.read_parquet(shard_paths).map_batches(
        old_filter, batch_format="pyarrow"
    )

    # new shingles: candidate-id filtered single pass over the batch
    ids_ref = ray.put(new_id_arr.astype(np.int64))
    k = meta["k"]

    def new_shingle_batch(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("doc_id"),
                        value_set=pa.array(ray.get(ids_ref), pa.int64()))
        kept = batch.filter(keep)
        out = [sorted(_word_shingles(t or "", k))
               for t in kept.column("text").to_pylist()]
        return pa.table({
            "new_doc_id": kept.column("doc_id"),
            "new_shingles": pa.array(out, pa.list_(pa.uint32())),
        })

    new_sh = new_docs_ds.select_columns(["doc_id", "text"]).map_batches(
        new_shingle_batch, batch_format="pyarrow"
    )

    joined = hash_join(
        hash_join(pairs, old_sh, "doc_id", "doc_id",
                  left_cols=["new_doc_id", "doc_id"],
                  right_cols=["shingles"]),
        new_sh, "new_doc_id", "new_doc_id",
        left_cols=["new_doc_id", "doc_id", "shingles"],
        right_cols=["new_shingles"],
    )

    def verify(batch: pa.Table) -> pa.Table:
        new_ids, old_ids_, js = [], [], []
        for nid, oid, so, sn in zip(
            batch.column("new_doc_id").to_pylist(),
            batch.column("doc_id").to_pylist(),
            batch.column("shingles").to_pylist(),
            batch.column("new_shingles").to_pylist(),
        ):
            a, b = set(so or ()), set(sn or ())
            union = len(a | b)
            j = (len(a & b) / union) if union else 1.0
            if j >= threshold:
                new_ids.append(nid)
                old_ids_.append(oid)
                js.append(round(j, 6))
        return pa.table({
            "new_doc_id": pa.array(new_ids, pa.int64()),
            "old_doc_id": pa.array(old_ids_, pa.int64()),
            "jaccard": pa.array(js, pa.float64()),
        })

    return joined.map_batches(verify, batch_format="pyarrow")
