"""Raw-file source: directories of .pdf/.html files → pages Dataset.

The reference's input is literal files on disk (one PDF per CLI run,
reference: main.py:65); a reference user switching to this engine
points the same directories here. ``ray.data.read_binary_files`` loads
each file as one row (streaming, parallel across files), mapped into
the canonical pages schema ``(url, warc_ts, html, text, lang)``:

- ``url``     = file:// URI of the source path (the per-document key)
- ``warc_ts`` = a fixed epoch (file mtimes are not hermetic; lineage
  belongs to the manifest, not the row)
- ``html``    = raw payload bytes (PDF or HTML — the sniff router
  dispatches, same as for crawled pages)
- ``text``    = null (no golden channel for arbitrary user files)
- ``lang``    = null
"""
from __future__ import annotations

import datetime as _dt
from typing import List, Optional, Sequence

import pyarrow as pa

_EPOCH = _dt.datetime(2025, 1, 1)


def pages_from_files(paths: Sequence[str], file_extensions: Optional[List[str]] = None):
    """Files/dirs → pages Dataset in the canonical input schema."""
    import ray.data

    ds = ray.data.read_binary_files(
        list(paths),
        include_paths=True,
        file_extensions=file_extensions,
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        paths_col = batch.column("path").to_pylist()
        n = batch.num_rows
        return pa.table(
            {
                "url": pa.array([f"file://{p}" for p in paths_col], pa.string()),
                "warc_ts": pa.array([_EPOCH] * n, pa.timestamp("us")),
                "html": batch.column("bytes").cast(pa.large_binary()),
                "text": pa.nulls(n, pa.large_string()),
                "lang": pa.nulls(n, pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")
