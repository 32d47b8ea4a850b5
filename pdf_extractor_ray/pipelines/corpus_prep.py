"""End-to-end training-corpus preparation pipeline.

The composition a user of the reference engine actually needs at
corpus scale — every stage is one of this repo's operators, chained
as a streaming Dataset plan with NO driver-side membership structure
anywhere (web crawls run 30-50% duplicates, so anything ∝ duplicate
count is effectively corpus-sized and must never be collected or
broadcast):

    documents
      → text features + quality score          [vectorized map_batches]
      → quality / language gate                [filter, pushed early]
      → exact dedup                            [ONE hash-partitioned
                                                groupby(text_hash) with a
                                                per-block partial, keep
                                                min doc_id — the only
                                                corpus-sized shuffle]
      → MinHash-LSH near-dup removal           [bands shuffle + distributed
                                                verify; drop ids stay a
                                                DATASET and are removed by
                                                a keys-only ANTI-JOIN]
      → surviving docs with features           [write-ready, text dropped]

Scale notes: the exact-dedup groupby is keyed by md5 (uniform, no
skew), and the per-block partial means a hot cluster (one text crawled
10^7 times) contributes at most one row PER BLOCK to the shuffle, not
all its copies to one task. The near-dup drop set flows as the right
side of ``semi_anti_join`` — bare keys through a hash shuffle — and the
anti-join's left side carries only (doc_id, lang, n_tokens,
quality_score); text never moves after the exact-dedup pass.

The reference has no corpus pipeline at all (one document per CLI
run); this is the "switch to this engine" path end-to-end.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

_META_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("lang", pa.string()),
        pa.field("n_tokens", pa.int64()),
        pa.field("quality_score", pa.float64()),
    ]
)


def exact_dedup_rows(ds, key_col: str = "text_hash", id_col: str = "doc_id"):
    """Keep ONE row (min ``id_col``) per distinct ``key_col`` — the
    row-preserving twin of ``functions.dedup.exact_dedup`` (which
    returns only the (hash, rep, count) summary).

    Min-by-key is associative, so a per-block partial first reduces
    every block to one candidate row per key present in it; the global
    groupby then sees ≤ n_blocks rows per key — a hot duplicate
    cluster can never concentrate its full row set in one task.
    """

    def partial_min(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        keys = np.asarray(batch.column(key_col).to_pylist())
        ids = np.asarray(batch.column(id_col).to_pylist())
        order = np.lexsort((ids, keys))
        sk = keys[order]
        first_of_run = np.nonzero(np.concatenate([[True], sk[1:] != sk[:-1]]))[0]
        return batch.take(pa.array(order[first_of_run], pa.int64()))

    def take_min(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(id_col).to_pylist())
        return group.slice(int(np.argmin(ids)), 1)

    return (
        ds.map_batches(partial_min, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(take_min, batch_format="pyarrow")
    )


def corpus_prep_pipeline(
    docs_ds,
    min_quality: float = 0.3,
    keep_langs: tuple = ("en", "de", "fr", "es"),
    near_dup_threshold: float = 0.5,
):
    """documents → deduplicated, quality-gated corpus Dataset with
    ``(doc_id, lang, n_tokens, quality_score)``. Deterministic: the
    kept representative of every duplicate cluster is the smallest
    doc_id."""
    import pyarrow.compute as pc
    import ray.data

    from ..functions.dedup import add_exact_hash, minhash_lsh_verified
    from ..functions.joins import semi_anti_join
    from ..functions.text import add_quality_score, add_text_features

    scored = (
        docs_ds.map_batches(add_text_features, batch_format="pyarrow")
        .map_batches(add_quality_score, batch_format="pyarrow")
    )

    lang_set = list(keep_langs)

    def gate(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch.column("quality_score"), min_quality),
            pc.is_in(batch.column("lang"), value_set=pa.array(lang_set)),
        )
        return batch.filter(keep).select(
            ["doc_id", "lang", "text", "n_tokens", "quality_score"]
        )

    gated = scored.map_batches(gate, batch_format="pyarrow")

    # exact dedup: one hash-keyed groupby keeps the min-doc_id row of
    # every distinct text. Materialized because it is consumed twice
    # (near-dup band/verify pass + final anti-join) and Datasets
    # re-execute lineage per consumer.
    exact_unique = exact_dedup_rows(
        gated.map_batches(add_exact_hash, batch_format="pyarrow")
    ).materialize()
    if exact_unique.count() == 0:
        return ray.data.from_arrow(_META_SCHEMA.empty_table())

    # near-dup removal: drop the LARGER doc_id of every verified pair.
    # The drop ids stay a Dataset end-to-end (they are ∝ near-dup
    # count — NOT broadcastable at crawl dup rates) and are removed by
    # an anti-join whose left side is the text-free metadata
    # projection: bare keys shuffle on the right, 4 small columns on
    # the left, text on neither.
    pairs = minhash_lsh_verified(
        exact_unique.select_columns(["doc_id", "text"]),
        threshold=near_dup_threshold,
    )
    meta = exact_unique.select_columns(
        ["doc_id", "lang", "n_tokens", "quality_score"]
    )
    return semi_anti_join(
        meta,
        pairs,
        "doc_id",
        "doc_b",
        ["doc_id", "lang", "n_tokens", "quality_score"],
        how="anti",
    )
