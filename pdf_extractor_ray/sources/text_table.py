"""CSV / JSONL document-table sources.

Corpora arrive as more than parquet: crawl exports and labeling tools
commonly emit JSONL (one JSON object per line) or CSV. These thin
wrappers read either format with Ray's native distributed readers
(every file split is its own read task — same streaming/backpressure
behavior as the parquet path) and normalize to the engine's
``documents`` shape ``(doc_id:int64, text:string, lang:string)`` so
every downstream operator (dedup, quality, corpus_prep, …) works
unchanged.

Columns beyond the three are preserved; missing ``lang`` defaults to
'unknown'; ``doc_id`` is cast to int64 (the id contract every dedup
path keys on).
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _normalize(batch: pa.Table) -> pa.Table:
    if "doc_id" not in batch.column_names or "text" not in batch.column_names:
        raise ValueError(
            "documents source needs 'doc_id' and 'text' columns; got "
            f"{batch.column_names}"
        )
    out = batch.set_column(
        batch.column_names.index("doc_id"),
        "doc_id",
        batch.column("doc_id").cast(pa.int64()),
    )
    out = out.set_column(
        out.column_names.index("text"),
        "text",
        out.column("text").cast(pa.string()),
    )
    if "lang" in out.column_names:
        out = out.set_column(
            out.column_names.index("lang"),
            "lang",
            pc.fill_null(out.column("lang").cast(pa.string()), "unknown"),
        )
    else:
        out = out.append_column(
            "lang", pa.array(["unknown"] * out.num_rows, pa.string())
        )
    return out


def documents_from_jsonl(paths):
    """JSONL file(s)/dir(s) → normalized documents Dataset."""
    import ray.data

    return ray.data.read_json(paths).map_batches(
        _normalize, batch_format="pyarrow"
    )


def documents_from_csv(paths):
    """CSV file(s)/dir(s) → normalized documents Dataset."""
    import ray.data

    return ray.data.read_csv(paths).map_batches(
        _normalize, batch_format="pyarrow"
    )
