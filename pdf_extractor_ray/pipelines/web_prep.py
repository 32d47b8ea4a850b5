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
    texts = batch.column("extracted_text").to_pylist()
    digs = [hashlib.md5((t or "").encode("utf-8")).digest() for t in texts]
    h = np.frombuffer(b"".join(d[:8] for d in digs), dtype=np.uint64) if digs \
        else np.zeros(0, dtype=np.uint64)
    part = (h % np.uint64(num_partitions)).astype(np.int32)
    return batch.append_column(
        "__wh", pa.array(h.astype(np.int64), pa.int64())
    ).append_column("__wpart", pa.array(part, pa.int32()))


def _survivor_fold(group: pa.Table) -> pa.Table:
    urls = np.asarray(group.column("url").to_pylist())
    h = group.column("__wh").to_numpy(zero_copy_only=False)
    order = np.lexsort((urls, h))
    sh = h[order]
    starts = np.nonzero(np.concatenate([[True], sh[1:] != sh[:-1]]))[0]
    keep_idx = order[starts]  # min url within each distinct hash
    out = group.take(pa.array(np.sort(keep_idx)))
    return out.drop_columns(["__wh", "__wpart"])


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
