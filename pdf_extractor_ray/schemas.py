"""Arrow schemas for every table that crosses a stage boundary.

Fixed schemas (no inference), mirroring the reference's fixed Pydantic
models (reference: extractor/models/base.py, construction.py,
standard.py) re-expressed as pyarrow types per FIXTURES.md.
"""
from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- input (F1)
# Authoritative input shape per BASELINE.json input_hint.
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),  # golden channel (reference-extracted text)
        ("lang", pa.string()),
    ]
)

# ------------------------------------------------------- span struct (F5)
SPAN_TYPE = pa.struct(
    [
        ("block_id", pa.int32()),
        ("start", pa.int64()),  # UTF-8 byte offset into extracted_text
        ("stop", pa.int64()),
        ("kind", pa.string()),  # html tag ('p','h1','tr',...) or 'line' for pdf
    ]
)

PAGE_STRUCT_TYPE = pa.struct(
    [
        ("page_num", pa.int32()),  # 1-based, as in the reference
        ("text", pa.large_string()),
        ("width", pa.float32()),
        ("height", pa.float32()),
    ]
)

# ragged tables →  tables → rows → cells (nullable), reference models/base.py:39-42
TABLES_TYPE = pa.list_(pa.list_(pa.list_(pa.string())))

# ---------------------------------------------------- extraction output (F5)
EXTRACT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("doc_kind", pa.string()),  # 'html' | 'pdf' | 'unknown'
        ("extracted_text", pa.large_string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("extract_status", pa.string()),  # ok|empty|parse_error|unknown_kind
        ("n_pages", pa.int32()),
        ("n_blocks", pa.int32()),
        ("n_chars", pa.int64()),
        ("n_words", pa.int64()),
    ]
)

# extraction output + per-page payloads (items pipeline needs page texts)
EXTRACT_PAGES_SCHEMA = pa.schema(
    list(EXTRACT_SCHEMA)
    + [
        ("pages", pa.list_(PAGE_STRUCT_TYPE)),
        ("tables", pa.list_(TABLES_TYPE)),  # one entry per page
    ]
)

# ------------------------------------------------------------- items (F2)
# quantity is Union[int,str] in the reference (models/construction.py:69-88);
# encoded as two nullable columns with the invariant "at most one set".
ITEMS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("fixture_type", pa.string()),
        ("qty_int", pa.int64()),
        ("qty_ref", pa.string()),
        ("model_number", pa.string()),
        ("dimensions", pa.string()),
        ("mounting_type", pa.string()),
        ("spec_reference", pa.string()),
        ("page_number", pa.int32()),
        ("table_number", pa.int32()),
        ("row_number", pa.int32()),
        ("line_number", pa.int32()),
        ("raw_text", pa.string()),
    ]
)

# ------------------------------------------------------------ entities (F4)
ENTITY_KINDS = ("email", "phone", "date", "currency", "url_ref", "ssn")
ENTITIES_SCHEMA = pa.schema(
    [("url", pa.string())] + [(k, pa.list_(pa.string())) for k in ENTITY_KINDS]
)

# ------------------------------------------------------------ manifest (F6)
MANIFEST_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("input_file", pa.string()),
        ("row_start", pa.int64()),
        ("row_stop", pa.int64()),
        ("checksum", pa.string()),
        ("docs_in", pa.int64()),
        ("docs_ok", pa.int64()),
        ("parse_errors", pa.int64()),
        ("commit_ts", pa.timestamp("us")),
    ]
)

EMPTY_EXTRACT_TABLE = pa.table(
    {f.name: pa.array([], type=f.type) for f in EXTRACT_SCHEMA}
)
