"""DSIR-style data selection via importance resampling.

Method (public): Xie et al., "Data Selection for Language Models via
Importance Resampling" (NeurIPS 2023) — estimate cheap bag-of-hashed-
n-gram distributions for a small TARGET corpus (the data you want more
of) and the big SOURCE corpus, score every source document with its
log importance ratio under those models, and resample with Gumbel
noise so selection probability tracks the ratio instead of taking a
brittle hard top-k. This engine re-expresses it Ray-Data-first:

- **Features** are byte k-gram rolling hashes folded into ``n_buckets``
  counts — the same vectorized ``sliding_window_view`` polynomial hash
  the winnowing fingerprinter uses (no per-token Python, no tokenizer
  dependency, deterministic across processes).
- **Fitting** is one streaming pass per corpus: each block reduces to a
  single ``n_buckets``-long count vector (a few KiB), a distributed
  tree-merge level sums those ``merge_fanin`` at a time, and only the
  merged vectors reach the driver — corpus text never moves. At
  100 TB the fit fan-in is blocks / merge_fanin × n_buckets × 8 B,
  not one row per block; in practice you fit on a hash-sample of the
  source.
- **Scoring** broadcasts the log-ratio vector once (``ray.put``) and is
  a zero-copy gather-mean per document inside ``map_batches``.
- **Resampling** is the associative Gumbel top-n: ``score = logw +
  Gumbel(u)`` with u a deterministic uniform from ``md5(str(doc_id))``
  (reproducible across runs and retries, like every sampler in
  ``sample.py``); each block ships only its local top-n, a final
  blocks×n sort picks the winners — no full shuffle, no driver-side
  corpus.

The log weight is LENGTH-NORMALIZED (mean log-ratio per gram, not the
paper's raw sum) so selection reflects distributional match rather than
document length; the raw-sum behaviour is ``normalize=False``.

The reference repo has no data-selection surface (single-document CLI);
this is engine-side infrastructure for corpus curation at scale.
"""
from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pyarrow as pa

_WS = re.compile(r"\s+")
_B = np.uint64(1000003)
_DENOM = float((1 << 52) + 1)


def _gram_bucket_idx(text: str, k: int, n_buckets: int) -> np.ndarray:
    """Byte k-gram rolling-hash feature indices of one document
    (one int per gram, in [0, n_buckets)) — vectorized, no per-gram
    Python. Shorter-than-k docs hash as a single gram."""
    from .joins import mix64

    b = _WS.sub(" ", (text or "").lower().strip()).encode("utf-8", "surrogatepass")
    a = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    if len(a) == 0:
        return np.array([], dtype=np.int64)
    kk = min(k, len(a))
    powers = _B ** np.arange(kk - 1, -1, -1, dtype=np.uint64)
    grams = np.lib.stride_tricks.sliding_window_view(a, kk)
    h = mix64((grams * powers).sum(axis=1).astype(np.uint64))
    return (h % np.uint64(n_buckets)).astype(np.int64)


def fit_feature_counts(ds, text_col: str = "text", k: int = 4,
                       n_buckets: int = 4096, merge_fanin: int = 64) -> np.ndarray:
    """One pass over ``ds`` → total hashed-gram counts, shape
    ``(n_buckets,)`` float64. Each block reduces to ONE fixed-size
    count vector, then a distributed tree-merge level sums
    ``merge_fanin`` vectors per task (same shape as the sketch
    partials), so the driver folds over blocks / merge_fanin rows —
    not one row per block."""

    def block_counts(batch: pa.Table) -> pa.Table:
        acc = np.zeros(n_buckets, dtype=np.int64)
        for text in batch.column(text_col).to_pylist():
            idx = _gram_bucket_idx(text, k, n_buckets)
            if len(idx):
                acc += np.bincount(idx, minlength=n_buckets)
        return pa.table({"c": pa.array([acc.tolist()],
                                       pa.list_(pa.int64(), n_buckets))})

    def merge_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        mat = np.asarray(batch.column("c").to_pylist(), dtype=np.int64)
        return pa.table({"c": pa.array([mat.sum(axis=0).tolist()],
                                       pa.list_(pa.int64(), n_buckets))})

    merged = (
        ds.map_batches(block_counts, batch_format="pyarrow")
        .map_batches(merge_counts, batch_size=merge_fanin,
                     batch_format="pyarrow")
    )
    total = np.zeros(n_buckets, dtype=np.float64)
    for row in merged.iter_rows():
        total += np.asarray(row["c"], dtype=np.float64)
    return total


def log_importance_ratio(target_counts: np.ndarray,
                         source_counts: np.ndarray,
                         alpha: float = 0.5) -> np.ndarray:
    """log p_target(f) − log p_source(f) with add-``alpha`` smoothing."""
    t = target_counts + alpha
    s = source_counts + alpha
    return np.log(t / t.sum()) - np.log(s / s.sum())


def dsir_weights(ds, log_ratio: np.ndarray, text_col: str = "text",
                 k: int = 4, normalize: bool = True,
                 out_col: str = "dsir_logw"):
    """Attach each document's log importance weight. ``log_ratio`` is
    broadcast once; per doc the weight is a gather(+mean) over its
    gram feature indices."""
    import ray

    n_buckets = len(log_ratio)
    lr_ref = ray.put(np.asarray(log_ratio, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        lr = ray.get(lr_ref)
        out = np.empty(batch.num_rows, dtype=np.float64)
        for i, text in enumerate(batch.column(text_col).to_pylist()):
            idx = _gram_bucket_idx(text, k, n_buckets)
            if len(idx) == 0:
                out[i] = -np.inf  # empty docs never win a resample
                continue
            s = lr[idx].sum()
            out[i] = s / len(idx) if normalize else s
        return batch.append_column(out_col, pa.array(out, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_select(source_ds, target_ds, n: int, text_col: str = "text",
                id_col: str = "doc_id", k: int = 4, n_buckets: int = 4096,
                alpha: float = 0.5, gumbel_scale: float = 1.0):
    """End-to-end DSIR: fit target + source gram distributions, score
    every source doc, Gumbel-resample exactly ``n`` winners.

    Deterministic: the Gumbel noise is derived from ``md5(str(id))``,
    so retries and re-runs pick the same set. ``gumbel_scale``
    trades exploration (1.0 = paper-faithful resampling) against
    exploitation (→0 = hard top-n by weight). Associative: blocks ship
    local top-n only. Output: source rows + ``dsir_logw``, ``n`` rows.
    """
    import heapq

    tgt = fit_feature_counts(target_ds, text_col, k, n_buckets)
    src = fit_feature_counts(source_ds, text_col, k, n_buckets)
    lr = log_importance_ratio(tgt, src, alpha)
    scored = dsir_weights(source_ds, lr, text_col, k, out_col="dsir_logw")

    def local_top(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        w = batch.column("dsir_logw").to_numpy(zero_copy_only=False)
        keys = []
        for i, v in enumerate(ids):
            h = int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16)
            u = (h + 1) / _DENOM
            g = -math.log(-math.log(u))
            keys.append(-(w[i] + gumbel_scale * g))  # ascending sort
        keep = heapq.nsmallest(n, range(len(keys)),
                               key=lambda i: (keys[i], ids[i]))
        out = batch.take(pa.array(sorted(keep), pa.int64()))
        return out.append_column(
            "__rank", pa.array([keys[i] for i in sorted(keep)], pa.float64())
        )

    return (
        scored.map_batches(local_top, batch_format="pyarrow")
        .sort(["__rank", id_col])
        .limit(n)
        .drop_columns(["__rank"])
    )
