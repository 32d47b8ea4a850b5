"""End-to-end training-corpus preparation pipeline.

The composition a user of the reference engine actually needs at
corpus scale — every stage is one of this repo's operators, chained
as a single streaming Dataset plan plus two bounded side-computations:

    documents
      → text features + quality score          [vectorized map_batches]
      → quality / language gate                [filter, pushed early]
      → exact dedup                            [hash groupby, (hash,id) only]
      → MinHash-LSH near-dup removal           [bands shuffle + distributed
                                                verify; drop-set broadcast]
      → surviving docs with features           [write-ready]

Only two things are ever collected: the exact-dup representative set
and the near-dup drop set — both ∝ duplicate count, never corpus-sized
(the same broadcast-membership contract as ``candidate_shingles``).

The reference has no corpus pipeline at all (one document per CLI
run); this is the "switch to this engine" path end-to-end.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


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
    import ray

    from ..functions.dedup import exact_dedup, minhash_lsh_verified
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

    gated = scored.map_batches(gate, batch_format="pyarrow").materialize()
    # ^ consumed three times below (exact-dup pass, near-dup pass,
    #   final filter); the gated corpus is the working set

    # exact dedup: survivors = min doc_id per distinct text. Broadcast
    # ONLY the duplicated hashes' representatives (∝ dup-cluster
    # count) — never the full representative set, which is
    # corpus-sized. A doc survives iff its text hash is not duplicated
    # OR it is the cluster's min doc_id.
    reps = exact_dedup(gated)
    def only_dup_clusters(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column("count()"), 1))

    dup_reps = {
        r["text_hash"]: r["min(doc_id)"]
        for r in reps.map_batches(
            only_dup_clusters, batch_format="pyarrow"
        ).take_all()
    }
    rep_ref = ray.put(dup_reps)

    def keep_reps(batch: pa.Table) -> pa.Table:
        import hashlib

        lookup = ray.get(rep_ref)
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        keep = []
        for i, t in zip(ids, texts):
            rep = lookup.get(hashlib.md5((t or "").encode("utf-8")).hexdigest())
            keep.append(rep is None or rep == i)
        return batch.filter(pa.array(keep))

    exact_unique = gated.map_batches(keep_reps, batch_format="pyarrow").materialize()

    # near-dup removal: drop the LARGER doc_id of every verified pair
    pairs = minhash_lsh_verified(
        exact_unique.select_columns(["doc_id", "text"]),
        threshold=near_dup_threshold,
    )
    drop = np.unique(
        np.asarray([r["doc_b"] for r in pairs.take_all()], dtype=np.int64)
    )
    drop_ref = ray.put(drop)

    def drop_near_dups(batch: pa.Table) -> pa.Table:
        if len(ray.get(drop_ref)) == 0:
            mask = pa.array([True] * batch.num_rows)
        else:
            mask = pc.invert(
                pc.is_in(
                    batch.column("doc_id"),
                    value_set=pa.array(ray.get(drop_ref), pa.int64()),
                )
            )
        return batch.filter(mask).drop_columns(["text"])

    return exact_unique.map_batches(drop_near_dups, batch_format="pyarrow")
