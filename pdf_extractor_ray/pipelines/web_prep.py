"""End-to-end web-corpus preparation over the PAGES table: the
flagship composition a 100-TB crawl run executes — extraction →
quality gate → exact dedup → survivor corpus — as ONE streaming plan.

This is the pages-input analogue of :mod:`corpus_prep` (which cleans a
pre-extracted documents table).  Stages:

1. sniff-routed extraction (``extraction_pipeline`` — the from-scratch
   HTML boilerplate stripper / PDF layout codec over raw bytes),
2. quality gate: ``extract_status == 'ok'`` and ``n_words >= min_words``
   (degraded/boilerplate-only/short pages drop),
3. exact near-zero-cost dedup: md5 of ``extracted_text``; ONE
   hash-keyed partition exchange where each distinct text lands wholly
   in one partition and the in-partition vectorized fold keeps the
   min-url row — only (hash, row) pairs shuffle, texts shuffle ONCE.

Scale notes: no driver materialization anywhere, no broadcast sets
(the round-2 corpus_prep lesson), output is partitioned parquet via
the caller's ``write_parquet``.  Survivor identity is deterministic
(min url per distinct text), so re-runs are idempotent.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _hash_part(batch: pa.Table, num_partitions: int) -> pa.Table:
    """Attach the FULL 128-bit md5 of extracted_text as two int64
    columns (``__wh`` high half — also the partition key — and
    ``__wl`` low half).  Partitioning only needs 64 bits, but the
    exact-dedup contract compares all 128: a 64-bit birthday collision
    is expected at ~1e9+ docs and must not merge distinct texts."""
    texts = batch.column("extracted_text").to_pylist()
    digs = [hashlib.md5((t or "").encode("utf-8")).digest() for t in texts]
    if digs:
        both = np.frombuffer(b"".join(digs), dtype=np.uint64).reshape(-1, 2)
        h, lo = both[:, 0].copy(), both[:, 1].copy()
    else:
        h = lo = np.zeros(0, dtype=np.uint64)
    part = (h % np.uint64(num_partitions)).astype(np.int32)
    return (
        batch.append_column("__wh", pa.array(h.astype(np.int64), pa.int64()))
        .append_column("__wl", pa.array(lo.astype(np.int64), pa.int64()))
        .append_column("__wpart", pa.array(part, pa.int32()))
    )


def _survivor_fold(group: pa.Table) -> pa.Table:
    urls = np.asarray(group.column("url").to_pylist())
    h = group.column("__wh").to_numpy(zero_copy_only=False)
    lo = group.column("__wl").to_numpy(zero_copy_only=False)
    order = np.lexsort((urls, lo, h))
    sh, sl = h[order], lo[order]
    starts = np.nonzero(
        np.concatenate([[True], (sh[1:] != sh[:-1]) | (sl[1:] != sl[:-1])])
    )[0]
    keep_idx = order[starts]  # min url within each distinct 128-bit digest
    out = group.take(pa.array(np.sort(keep_idx)))
    return out.drop_columns(["__wh", "__wl", "__wpart"])


def web_prep_pipeline(pages_ds, min_words: int = 30, num_partitions: int = 32):
    """pages (url, warc_ts, html, lang) → deduped quality corpus
    ``(url, extracted_text, n_words)``."""
    from .extraction import extraction_pipeline

    ds = extraction_pipeline(pages_ds)
    ds = ds.filter(expr=f"extract_status == 'ok' and n_words >= {min_words}")
    ds = ds.select_columns(["url", "extracted_text", "n_words"])
    return (
        ds.map_batches(
            lambda b: _hash_part(b, num_partitions), batch_format="pyarrow"
        )
        .groupby("__wpart")
        .map_groups(_survivor_fold, batch_format="pyarrow")
    )


def run_web_prep_job(
    input_files,
    out_dir: str,
    files_per_partition: int = 16,
    min_words: int = 30,
    num_partitions: int = 32,
    emit_wet: bool = False,
) -> dict:
    """Checkpointed, RESUMABLE flagship job — the global-dedup answer
    to per-partition checkpointing:

    - **Phase 1 (checkpointed)**: extraction + quality gate run per
      input partition with the same atomic commit + lineage manifest
      as ``run_extraction_job`` (under ``out_dir/stage1``); a killed
      run resumes from the last committed partition, re-extracting
      nothing.
    - **Phase 2 (recomputed on resume, by design)**: the GLOBAL exact
      dedup cannot be checkpointed per input partition — a duplicate
      pair may span partitions — so it re-runs over phase-1's gated
      intermediates (a column-pruned read of survivors only, a small
      fraction of the raw corpus) and writes the final survivor
      parquet to ``out_dir/final``.  Phase 2 cost is one hash exchange
      over already-extracted text: cheap relative to re-extraction,
      and always consistent with whatever phase-1 state resumed.
    """
    import glob as _glob
    import shutil

    import ray.data

    from ..pipelines.extraction import extraction_pipeline
    from ..state.manifest import Manifest, partition_plan

    import os

    stage1 = os.path.join(out_dir, "stage1")
    manifest = Manifest(stage1)
    plan = partition_plan(list(input_files), files_per_partition)
    skipped = 0
    for pid, files in enumerate(plan):
        if manifest.is_committed(pid):
            skipped += 1
            continue
        tmp = manifest.tmp_dir(pid)
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        ds = ray.data.read_parquet(
            list(files), columns=["url", "warc_ts", "html", "lang"]
        )
        gated = extraction_pipeline(ds).filter(
            expr=f"extract_status == 'ok' and n_words >= {min_words}"
        ).select_columns(["url", "extracted_text", "n_words"])
        gated.write_parquet(tmp)
        import pyarrow.parquet as _pq

        n_rows = sum(
            _pq.read_metadata(f).num_rows
            for f in sorted(_glob.glob(os.path.join(tmp, "*.parquet")))
        )
        manifest.commit(pid, files, {"docs_in": -1, "docs_ok": n_rows})

    # phase 2: global dedup over every committed partition's output
    part_dirs = [manifest.partition_dir(pid) for pid in range(len(plan))]
    shards = [
        f for d in part_dirs for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))
    ]
    final = os.path.join(out_dir, "final")
    if os.path.isdir(final):
        shutil.rmtree(final)
    gated_all = ray.data.read_parquet(shards)
    survivors = (
        gated_all.map_batches(
            lambda b: _hash_part(b, num_partitions), batch_format="pyarrow"
        )
        .groupby("__wpart")
        .map_groups(_survivor_fold, batch_format="pyarrow")
    )
    survivors.write_parquet(final)
    import pyarrow.parquet as _pq

    n_final = sum(
        _pq.read_metadata(f).num_rows
        for f in sorted(_glob.glob(os.path.join(final, "*.parquet")))
    )
    metrics = {
        "partitions_total": len(plan),
        "partitions_skipped": skipped,
        "survivors": n_final,
        "output": final,
    }
    if emit_wet:
        # publish the survivor corpus as Common-Crawl-style WET shards
        # (idempotent content-hash names; no warc_ts in the survivor
        # table → epoch timestamps, WET consumers key on URI)
        from ..sources.warc import write_wet

        wet_dir = os.path.join(out_dir, "wet")
        man = write_wet(
            ray.data.read_parquet(final), wet_dir
        ).to_pandas()
        metrics["wet_files"] = len(man)
        metrics["wet_records"] = int(man["n_records"].sum())
        metrics["wet_output"] = wet_dir
    return metrics
