"""Persisted BM25 lexical index — the third member of the persisted-
index family (LSH near-dup recrawl index: ``lsh_index.py``; IVF ANN
index: ``ann_index.py``). Build ONCE over the historical corpus, query
many times: postings are stored hash-BUCKETED BY TOKEN
(``postings/bucket=i/part-*.parquet``), so a query reads ONLY its
terms' bucket dirs — no corpus scan, no quantizer refit, no index
broadcast; document lengths live in a slim side table
(``doclens/bucket=i``, 16 B/doc) joined only against candidates.

Tokenization/scoring contract is EXACTLY ``bm25_topk``'s (so its
DuckDB oracle applies verbatim): a token is an element of
``text.split(" ")`` (single-space split — the padded-substring kernel
counts a term's occurrences as exactly the number of equal elements);
``n_words = len(text.split(" "))``; idf is rounded to 9 digits BEFORE
use; per-doc contributions sum in fixed term order with the identical
float expression tree; final score rounds to 6; docs matching zero
terms are excluded; ties break doc_id ascending.

Scale: build is two corpus passes with NO shuffle (bucketed split-
append writes); a query moves only the queried terms' postings (two
int64 + one small string per row) plus one candidates-sized length
join. The boilerplate guard the LSH index needs is unnecessary here —
a stop-word's posting list is large but the per-term work is a single
vectorized filter + fold, never O(bucket²).
"""
from __future__ import annotations

import json
import os
from collections import Counter

import numpy as np
import pyarrow as pa

from .bucketed import write_bucketed
from .dedup import compact_blocks


def build_bm25_index(docs_ds, index_dir: str, *, num_buckets: int = 32,
                     text_col: str = "text", id_col: str = "doc_id") -> dict:
    """Build the persisted index: token-bucketed postings
    (token, doc_id, tf), doc-bucketed lengths, and a ``meta.json``
    carrying the corpus scalars (N, Σ n_words) the scorer needs."""
    from ray.data.aggregate import Count, Sum

    def postings(batch: pa.Table) -> pa.Table:
        ids, toks, tfs = [], [], []
        for d, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            for tok, c in Counter((t or "").split(" ")).items():
                if tok == "":
                    continue  # multi-space artifacts; never queried
                ids.append(d)
                toks.append(tok)
                tfs.append(c)
        return pa.table({
            "token": pa.array(toks, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "tf": pa.array(tfs, pa.int64()),
        })

    post = compact_blocks(
        docs_ds.select_columns([id_col, text_col]).map_batches(
            postings, batch_format="pyarrow"
        )
    )
    n_post = sum(
        r["n_rows"] for r in write_bucketed(
            post, "token", os.path.join(index_dir, "postings"),
            num_buckets,
        ).iter_rows()
    )

    def lengths(batch: pa.Table) -> pa.Table:
        out_ids, out_lens = [], []
        for d, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            out_ids.append(d)
            out_lens.append(len((t or "").split(" ")))
        return pa.table({
            "doc_id": pa.array(out_ids, pa.int64()),
            "n_words": pa.array(out_lens, pa.int64()),
        })

    lens_ds = compact_blocks(
        docs_ds.select_columns([id_col, text_col]).map_batches(
            lengths, batch_format="pyarrow"
        )
    )
    stats = lens_ds.aggregate(Count(alias_name="n"),
                              Sum("n_words", alias_name="sw"))
    sum(
        r["n_rows"] for r in write_bucketed(
            lens_ds, "doc_id", os.path.join(index_dir, "doclens"),
            num_buckets,
        ).iter_rows()
    )
    meta = {"num_buckets": num_buckets, "n_docs": int(stats["n"]),
            "sum_words": int(stats["sw"]), "n_postings": n_post}
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))
    return meta


def query_bm25_index(terms: "list[str]", index_dir: str, k: int = 10,
                     k1: float = 1.2, b: float = 0.75):
    """Ranked retrieval against the persisted index: read ONLY the
    queried terms' posting buckets, fold per-term document frequencies,
    pivot candidates per doc, join lengths, score with the exact
    ``bm25_topk`` expression tree. Returns a Dataset (doc_id, score),
    top-``k`` by (score desc, doc_id asc)."""
    import math

    import pyarrow.compute as pc
    import ray.data

    from .agg import partition_fold
    from .joins import _bucket_of, hash_join

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    nb = meta["num_buckets"]
    n = meta["n_docs"]
    avglen = float(meta["sum_words"]) / n

    tb = _bucket_of(pa.array(terms, pa.string()), nb)
    dirs = sorted({
        os.path.join(index_dir, "postings", f"bucket={int(i)}")
        for i in tb.to_pylist()
    })
    import glob as _glob

    files = [f for d in dirs
             for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))]
    term_set = pa.array(sorted(set(terms)), pa.string())
    if not files:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }))
    post = ray.data.read_parquet(files).map_batches(
        lambda t: t.filter(pc.is_in(t.column("token"),
                                    value_set=term_set)),
        batch_format="pyarrow",
    )
    post = compact_blocks(post)  # consumed twice: df fold + pivot
    if post.count() == 0:  # no term has postings — empty schema breaks
        return ray.data.from_arrow(pa.table({  # the downstream join
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }))

    dfs = {r["token"]: r["df"] for r in partition_fold(
        post.map_batches(
            lambda t: t.append_column(
                "__one", pa.array(np.ones(t.num_rows, np.int64))),
            batch_format="pyarrow",
        ),
        ["token"], "__one", fn="sum", out_val="df",
    ).take_all()}  # ≤ len(terms) rows — bounded by the query, not corpus
    idfs = [
        round(math.log((n - dfs.get(t, 0) + 0.5)
                       / (dfs.get(t, 0) + 0.5) + 1.0), 9)
        for t in terms
    ]
    t_idx = {t: i for i, t in enumerate(terms)}
    n_terms = len(terms)

    def widen(batch: pa.Table) -> pa.Table:
        toks = batch.column("token").to_pylist()
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        cols = {"doc_id": pa.array(d, pa.int64())}
        ti = np.asarray([t_idx[t] for t in toks], dtype=np.int64)
        for i in range(n_terms):
            v = np.where(ti == i, tf, 0)
            cols[f"tf{i}"] = pa.array(v, pa.int64())
        return pa.table(cols)

    # fold all tf columns per doc in ONE doc-space exchange
    def add_part(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        part = (d.view(np.uint64) % 64).astype(np.int32)
        return batch.append_column("__part", pa.array(part, pa.int32()))

    def fold(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="stable")
        sd = d[order]
        starts = np.nonzero(
            np.concatenate([[True], sd[1:] != sd[:-1]]))[0]
        cols = {"doc_id": pa.array(sd[starts], pa.int64())}
        for i in range(n_terms):
            v = group.column(f"tf{i}").to_numpy(
                zero_copy_only=False)[order]
            cols[f"tf{i}"] = pa.array(
                np.add.reduceat(v, starts), pa.int64())
        return pa.table(cols)

    wide = (
        post.map_batches(widen, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(fold, batch_format="pyarrow")
    )

    lens_ds = ray.data.read_parquet(sorted(_glob.glob(
        os.path.join(index_dir, "doclens", "bucket=*", "*.parquet"))))
    joined = hash_join(
        wide, lens_ds, "doc_id", "doc_id",
        ["doc_id"] + [f"tf{i}" for i in range(n_terms)], ["n_words"],
        how="inner", validate="unique_right",
    )

    def score(batch: pa.Table) -> pa.Table:
        lens = batch.column("n_words").to_numpy(
            zero_copy_only=False).astype(np.float64)
        s = np.zeros(batch.num_rows)
        for i in range(n_terms):
            tfv = batch.column(f"tf{i}").to_numpy(
                zero_copy_only=False).astype(np.float64)
            s = s + idfs[i] * ((tfv * (k1 + 1.0))
                               / (tfv + k1 * (1.0 - b
                                              + b * lens / avglen)))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "score": pa.array(np.round(s, 6), pa.float64()),
        })

    return (
        joined.map_batches(score, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )
