"""Pipeline builders: sniff → route → codecs → union → downstream.

Engine lifecycle target shape (SURVEY.md §3.4):

    read_parquet(partitions)
      → map_batches(sniff_doc_kind)            # vectorized router
      → filter(html) / filter(pdf)             # two branches
      → map_batches(extract_html_batch)        # stateless tasks
        / map_batches(PdfExtractStage,
                      concurrency=(a,b),
                      batch_size=16)           # actor pool, small
                                               # batches defuse
                                               # giant-PDF skew
      → union
      → items / entities / stats / write

Skew note (north rule): giant PDFs are handled by the SMALL BATCH SIZE
on the PDF branch — a straggler document occupies one 16-row batch,
not a 1024-row block — and by actor-pool autoscaling; no all-to-all
repartition is needed, which matters at 100 TB where a shuffle of the
payload column would move the whole corpus.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import pyarrow as pa

from ..stages.extract import HtmlExtractStage, PdfExtractStage, sniff_doc_kind
from ..stages.parse import EntitiesStage, ItemsStage
from ..state.manifest import Manifest, partition_plan, rows_checksum

# module-level instance: compile-once-per-worker-process for the
# stateless task path (import-time init, SURVEY.md §7.3)
_HTML_STAGE: Optional[HtmlExtractStage] = None
_HTML_STAGE_PAGES: Optional[HtmlExtractStage] = None


def extract_html_batch(batch: pa.Table) -> pa.Table:
    global _HTML_STAGE
    if _HTML_STAGE is None:
        _HTML_STAGE = HtmlExtractStage(emit_pages=False)
    return _HTML_STAGE(batch)


def extract_html_batch_pages(batch: pa.Table) -> pa.Table:
    global _HTML_STAGE_PAGES
    if _HTML_STAGE_PAGES is None:
        _HTML_STAGE_PAGES = HtmlExtractStage(emit_pages=True)
    return _HTML_STAGE_PAGES(batch)


def extraction_pipeline(
    pages_ds,
    emit_pages: bool = False,
    pdf_concurrency: Tuple[int, int] = (1, 8),
    pdf_batch_size: int = 16,
    html_batch_size: int = 256,
):
    """pages Dataset → extraction Dataset (EXTRACT_SCHEMA [+pages])."""
    ds = pages_ds.map_batches(sniff_doc_kind, batch_format="pyarrow")
    html_fn = extract_html_batch_pages if emit_pages else extract_html_batch
    html_branch = ds.filter(expr="doc_kind != 'pdf'").map_batches(
        html_fn, batch_format="pyarrow", batch_size=html_batch_size
    )
    pdf_branch = ds.filter(expr="doc_kind == 'pdf'").map_batches(
        PdfExtractStage,
        fn_constructor_kwargs={"emit_pages": emit_pages},
        batch_format="pyarrow",
        batch_size=pdf_batch_size,
        concurrency=pdf_concurrency,
    )
    return html_branch.union(pdf_branch)


def items_pipeline(pages_ds, **kw):
    """pages Dataset → construction items Dataset (ITEMS_SCHEMA)."""
    extracted = extraction_pipeline(pages_ds, emit_pages=True, **kw)
    return extracted.map_batches(
        ItemsStage, batch_format="pyarrow", concurrency=(1, 8)
    )


def entities_pipeline(pages_ds, **kw):
    """pages Dataset → entities Dataset (ENTITIES_SCHEMA)."""
    extracted = extraction_pipeline(pages_ds, emit_pages=False, **kw)
    return extracted.map_batches(
        EntitiesStage, batch_format="pyarrow", concurrency=(1, 8)
    )


# ---------------------------------------------------------------- job runner
def run_extraction_job(
    input_files: Sequence[str],
    out_dir: str,
    files_per_partition: int = 16,
    **pipeline_kw,
) -> dict:
    """Checkpointed job: partitions of input files run as sequential
    commit points, each internally fully parallel; killed runs resume
    from the last committed partition (see state/manifest.py).

    Returns summary metrics {partitions_total, partitions_skipped,
    docs_in, docs_ok, parse_errors}.
    """
    import ray.data

    manifest = Manifest(out_dir)
    plan = partition_plan(input_files, files_per_partition)
    skipped = 0
    totals = {"docs_in": 0, "docs_ok": 0, "parse_errors": 0}

    for pid, files in enumerate(plan):
        if manifest.is_committed(pid):
            skipped += 1
            continue
        tmp = manifest.tmp_dir(pid)
        ds = ray.data.read_parquet(
            list(files), columns=["url", "warc_ts", "html", "lang"]
        )
        extracted = extraction_pipeline(ds, **pipeline_kw)
        extracted.write_parquet(tmp)

        # cheap metrics pass over the WRITTEN output (column-pruned read
        # of the small columns only — never re-runs extraction)
        res = ray.data.read_parquet(
            tmp, columns=["url", "extract_status", "n_chars"]
        )
        stats = res.map_batches(
            _partition_metrics_batch, batch_format="pyarrow"
        ).to_pandas()
        metrics = {
            "docs_in": int(stats["docs_in"].sum()),
            "docs_ok": int(stats["docs_ok"].sum()),
            "parse_errors": int(stats["parse_errors"].sum()),
            "checksum": _xor_all(stats["checksum"]),
        }
        manifest.commit(pid, files, metrics)
        for k in ("docs_in", "docs_ok", "parse_errors"):
            totals[k] += metrics[k]

    return {
        "partitions_total": len(plan),
        "partitions_skipped": skipped,
        **totals,
    }


def _partition_metrics_batch(batch: pa.Table) -> pa.Table:
    status = batch.column("extract_status").to_pylist()
    urls = batch.column("url").to_pylist()
    n_chars = batch.column("n_chars").to_pylist()
    return pa.table(
        {
            "docs_in": pa.array([len(status)], pa.int64()),
            "docs_ok": pa.array([sum(s == "ok" for s in status)], pa.int64()),
            "parse_errors": pa.array(
                [sum(s == "parse_error" for s in status)], pa.int64()
            ),
            "checksum": pa.array([rows_checksum(urls, n_chars)], pa.int64()),
        }
    )


def _xor_all(series) -> int:
    acc = 0
    for v in series:
        acc ^= int(v)
    return acc
