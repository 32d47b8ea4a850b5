"""Pipeline builders: sniff → route → codecs → downstream.

Engine lifecycle target shape (SURVEY.md §3.4, single-pass dispatch):

    read_parquet(partitions)
      → map_batches(extract_unified)   # sniff + per-row codec dispatch
      → items / entities / stats / write

Two architectures, measured head-to-head at 32 CPUs on a 40k-doc
corpus (bench, 2026-08):

- **unified** (default): ONE task-based ``map_batches`` stage sniffs
  the batch and routes rows to the HTML/PDF codec inside the task.
  Codec instances (pattern banks, font caches) are module-level
  worker-process globals — Ray reuses worker processes across tasks,
  so warm state amortizes exactly like an actor pool without the
  object-store round-trip per batch.  22.4k docs/s.
- **branched**: sniff → filter(html)/filter(pdf) → stateless HTML
  tasks ∪ PDF actor pool.  The shape SURVEY §3.4 sketched first; it
  executes the read+sniff prefix once per branch and pays actor-pool
  serialization.  5.8k docs/s — kept for workloads where the PDF side
  needs dedicated long-lived actors (e.g. a real OCR/model stage
  whose init cost is seconds, A1/A2 in SURVEY §2.3).

Skew note (north rule): giant PDFs are defused by MODEST BATCH SIZE —
a straggler document occupies one small batch, not a 1024-row block —
plus Ray Data's dynamic block splitting; no all-to-all repartition is
needed, which matters at 100 TB where a shuffle of the payload column
would move the whole corpus.
"""
from __future__ import annotations

import os
import shutil
from typing import Dict, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.extract import HtmlExtractStage, PdfExtractStage, sniff_doc_kind
from ..stages.parse import EntitiesStage, ItemsStage
from ..state.manifest import Manifest, partition_plan, rows_checksum

# module-level instances: compile-once-per-worker-process warm state
# for the task path (SURVEY.md §7.3 / A3-A4 analogue)
_STAGES: Dict[object, object] = {}


def _stage(kind: str, emit_pages: bool):
    key = (kind, emit_pages)
    st = _STAGES.get(key)
    if st is None:
        cls = HtmlExtractStage if kind == "html" else PdfExtractStage
        st = _STAGES[key] = cls(emit_pages=emit_pages)
    return st


def _extract_unified(batch: pa.Table, emit_pages: bool) -> pa.Table:
    """Sniff + dispatch inside one task: no double read, no union."""
    k = sniff_doc_kind(batch)
    is_pdf = pc.equal(k.column("doc_kind"), "pdf")
    html_part = k.filter(pc.invert(is_pdf))
    pdf_part = k.filter(is_pdf)
    outs = []
    if html_part.num_rows:
        outs.append(_stage("html", emit_pages)(html_part))
    if pdf_part.num_rows:
        outs.append(_stage("pdf", emit_pages)(pdf_part))
    if not outs:
        return _stage("html", emit_pages)(html_part)  # empty, right schema
    return pa.concat_tables(outs) if len(outs) > 1 else outs[0]


def extract_unified_batch(batch: pa.Table) -> pa.Table:
    return _extract_unified(batch, emit_pages=False)


def extract_unified_batch_pages(batch: pa.Table) -> pa.Table:
    return _extract_unified(batch, emit_pages=True)


def _default_pdf_concurrency() -> Tuple[int, int]:
    """Size the branched-mode PDF actor pool from the cluster: PDFs
    are ~10% of docs but most of the per-doc cost, so cap the pool at
    half the CPUs — the HTML task path fills the rest."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (2, max(4, cpus // 2))


def extraction_pipeline(
    pages_ds,
    emit_pages: bool = False,
    mode: str = "unified",
    pdf_concurrency: Optional[Tuple[int, int]] = None,
    pdf_batch_size: int = 16,
    html_batch_size: int = 256,
    batch_size: int = 128,
):
    """pages Dataset → extraction Dataset (EXTRACT_SCHEMA [+pages])."""
    if mode == "unified":
        fn = extract_unified_batch_pages if emit_pages else extract_unified_batch
        return pages_ds.map_batches(
            fn, batch_format="pyarrow", batch_size=batch_size
        )
    if pdf_concurrency is None:
        pdf_concurrency = _default_pdf_concurrency()
    ds = pages_ds.map_batches(sniff_doc_kind, batch_format="pyarrow")
    html_fn = extract_unified_batch_pages if emit_pages else extract_unified_batch
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


def _items_batch(batch: pa.Table) -> pa.Table:
    st = _STAGES.get("items")
    if st is None:
        st = _STAGES["items"] = ItemsStage()
    return st(batch)


def _entities_batch(batch: pa.Table) -> pa.Table:
    st = _STAGES.get("entities")
    if st is None:
        st = _STAGES["entities"] = EntitiesStage()
    return st(batch)


def items_pipeline(pages_ds, **kw):
    """pages Dataset → construction items Dataset (ITEMS_SCHEMA)."""
    extracted = extraction_pipeline(pages_ds, emit_pages=True, **kw)
    return extracted.map_batches(_items_batch, batch_format="pyarrow")


def entities_pipeline(pages_ds, **kw):
    """pages Dataset → entities Dataset (ENTITIES_SCHEMA)."""
    extracted = extraction_pipeline(pages_ds, emit_pages=False, **kw)
    return extracted.map_batches(_entities_batch, batch_format="pyarrow")


def _page_stats(pages) -> tuple:
    """Reference Statistics semantics over a page list: totals are
    summed PER PAGE (not over the '\\n\\n'-joined text), averages are 0
    for page-less documents (extractor/utils/helpers.py:67-86)."""
    pages = pages or []
    chars = [len(p["text"] or "") for p in pages]
    words = [len((p["text"] or "").split()) for p in pages]
    n = len(pages)
    tc, tw = sum(chars), sum(words)
    return n, tc, tw, (tc / n if n else 0.0), (tw / n if n else 0.0)


def _doc_statistics_batch(batch: pa.Table) -> pa.Table:
    cols = {k: [] for k in
            ("total_pages", "total_characters", "total_words",
             "avg_chars_per_page", "avg_words_per_page")}
    for pages in batch.column("pages").to_pylist():
        n, tc, tw, ac, aw = _page_stats(pages)
        cols["total_pages"].append(n)
        cols["total_characters"].append(tc)
        cols["total_words"].append(tw)
        cols["avg_chars_per_page"].append(ac)
        cols["avg_words_per_page"].append(aw)
    return pa.table(
        {
            "url": batch.column("url"),
            "total_pages": pa.array(cols["total_pages"], pa.int64()),
            "total_characters": pa.array(cols["total_characters"], pa.int64()),
            "total_words": pa.array(cols["total_words"], pa.int64()),
            "avg_chars_per_page": pa.array(cols["avg_chars_per_page"], pa.float64()),
            "avg_words_per_page": pa.array(cols["avg_words_per_page"], pa.float64()),
        }
    )


def doc_statistics_pipeline(pages_ds, **kw):
    """Per-url Statistics envelope — exact reference-field parity:
    total_pages / total_characters / total_words / avg_chars_per_page /
    avg_words_per_page (extractor/utils/helpers.py:67-86,
    models/base.py:8-15)."""
    extracted = extraction_pipeline(pages_ds, emit_pages=True, **kw)
    return extracted.map_batches(_doc_statistics_batch, batch_format="pyarrow")


def _standard_result_batch(batch: pa.Table) -> pa.Table:
    """One composed standard-mode record per document: full_text +
    entity lists + statistics (extractor/models/standard.py:28-71;
    full_text join semantics extractor/utils/helpers.py:39-64)."""
    from ..parsers.standard import EntityParser

    parser = _STAGES.get("entity_parser")
    if parser is None:
        parser = _STAGES["entity_parser"] = EntityParser()

    n = batch.num_rows
    ent_cols: Dict[str, list] = {
        k: [] for k in ("email", "phone", "date", "currency", "url_ref", "ssn")
    }
    stats_cols = {k: [] for k in
                  ("total_pages", "total_characters", "total_words",
                   "avg_chars_per_page", "avg_words_per_page")}
    for text, pages in zip(
        batch.column("extracted_text").to_pylist(),
        batch.column("pages").to_pylist(),
    ):
        ents = parser.extract_entities(text or "")
        ent_cols["email"].append(ents.get("email", []))
        ent_cols["phone"].append(ents.get("phone", []))
        ent_cols["date"].append(ents.get("date", []))
        ent_cols["currency"].append(ents.get("currency", []))
        ent_cols["url_ref"].append(ents.get("url", []))
        ent_cols["ssn"].append(ents.get("ssn", []))
        np_, tc, tw, ac, aw = _page_stats(pages)
        stats_cols["total_pages"].append(np_)
        stats_cols["total_characters"].append(tc)
        stats_cols["total_words"].append(tw)
        stats_cols["avg_chars_per_page"].append(ac)
        stats_cols["avg_words_per_page"].append(aw)

    out = {
        "url": batch.column("url"),
        "extraction_mode": pa.array(["standard"] * n, pa.string()),
        "full_text": batch.column("extracted_text"),
    }
    for k in ("email", "phone", "date", "currency", "url_ref", "ssn"):
        out[k] = pa.array(ent_cols[k], pa.list_(pa.string()))
    out["total_pages"] = pa.array(stats_cols["total_pages"], pa.int64())
    out["total_characters"] = pa.array(stats_cols["total_characters"], pa.int64())
    out["total_words"] = pa.array(stats_cols["total_words"], pa.int64())
    out["avg_chars_per_page"] = pa.array(stats_cols["avg_chars_per_page"], pa.float64())
    out["avg_words_per_page"] = pa.array(stats_cols["avg_words_per_page"], pa.float64())
    return pa.table(out)


def standard_result_pipeline(pages_ds, **kw):
    """pages Dataset → composed StandardExtractionResult records
    (mode, full_text, six entity lists, statistics) — the per-document
    envelope the reference writes as JSON
    (extractor/models/standard.py:28-71)."""
    extracted = extraction_pipeline(pages_ds, emit_pages=True, **kw)
    return extracted.map_batches(_standard_result_batch, batch_format="pyarrow")


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
    totals = {"docs_in": 0, "docs_ok": 0, "docs_html": 0, "docs_pdf": 0, "parse_errors": 0}

    for pid, files in enumerate(plan):
        if manifest.is_committed(pid):
            skipped += 1
            continue
        tmp = manifest.tmp_dir(pid)
        # a killed run may have left partial files in tmp; writing fresh
        # output ALONGSIDE them would commit duplicates — clear first
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        ds = ray.data.read_parquet(
            list(files), columns=["url", "warc_ts", "html", "lang"]
        )
        extracted = extraction_pipeline(ds, **pipeline_kw)
        extracted.write_parquet(tmp)

        # cheap metrics pass over the WRITTEN output (column-pruned read
        # of the small columns only — never re-runs extraction)
        res = ray.data.read_parquet(
            tmp, columns=["url", "doc_kind", "extract_status", "n_chars"]
        )
        stats = res.map_batches(
            _partition_metrics_batch, batch_format="pyarrow"
        ).to_pandas()
        metrics = {
            "docs_in": int(stats["docs_in"].sum()),
            "docs_ok": int(stats["docs_ok"].sum()),
            "docs_html": int(stats["docs_html"].sum()),
            "docs_pdf": int(stats["docs_pdf"].sum()),
            "parse_errors": int(stats["parse_errors"].sum()),
            "checksum": _xor_all(stats["checksum"]),
        }
        manifest.commit(pid, files, metrics)
        for k in ("docs_in", "docs_ok", "docs_html", "docs_pdf", "parse_errors"):
            totals[k] += metrics[k]

    return {
        "partitions_total": len(plan),
        "partitions_skipped": skipped,
        **totals,
    }


def _partition_metrics_batch(batch: pa.Table) -> pa.Table:
    status = batch.column("extract_status").to_pylist()
    kinds = batch.column("doc_kind").to_pylist()
    urls = batch.column("url").to_pylist()
    n_chars = batch.column("n_chars").to_pylist()
    return pa.table(
        {
            "docs_in": pa.array([len(status)], pa.int64()),
            "docs_ok": pa.array([sum(s == "ok" for s in status)], pa.int64()),
            "docs_html": pa.array([sum(k == "html" for k in kinds)], pa.int64()),
            "docs_pdf": pa.array([sum(k == "pdf" for k in kinds)], pa.int64()),
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
