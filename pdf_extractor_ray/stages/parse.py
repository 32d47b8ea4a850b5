"""Parsing stages: construction items (row explosion) and entities.

Both are stateless ``map_batches`` callables; pattern banks compile
once per worker in ``__init__`` (reference compiles per parser
instance, reference: extractor/parsers/construction.py:13-151).

ItemsStage is the engine's ``flat_map``: one document row → N item
rows (doc-local state machine, SURVEY.md M5-M8), emitted as an
exploded Arrow table.  Documents never span rows, so this is
embarrassingly parallel.
"""
from __future__ import annotations

from typing import Any, Dict, List

import pyarrow as pa

from ..parsers.construction import ConstructionItemParser
from ..parsers.standard import EntityParser
from ..schemas import ENTITY_KINDS, ITEMS_SCHEMA


def _qty_columns(items: List[Dict[str, Any]]):
    """Union[int,str] quantity → dual nullable columns (SURVEY §1.3)."""
    qty_int, qty_ref = [], []
    for it in items:
        q = it.get("quantity")
        if isinstance(q, int):
            qty_int.append(q)
            qty_ref.append(None)
        elif isinstance(q, str):
            # reference validator re-parses strings without '.'/',' as
            # int (reference: extractor/models/construction.py:69-88)
            if "." not in q and "," not in q:
                try:
                    qty_int.append(int(q))
                    qty_ref.append(None)
                    continue
                except ValueError:
                    pass
            qty_int.append(None)
            qty_ref.append(q)
        else:
            qty_int.append(None)
            qty_ref.append(None)
    return qty_int, qty_ref


class ItemsStage:
    """Extract-output batch (with ``pages``+``tables``) → items batch."""

    def __init__(self) -> None:
        self.parser = ConstructionItemParser()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        pages_col = batch.column("pages").to_pylist()
        tables_col = batch.column("tables").to_pylist()

        out_urls: List[str] = []
        items: List[Dict[str, Any]] = []
        for url, pages, page_tables in zip(urls, pages_col, tables_col):
            doc_items: List[Dict[str, Any]] = []
            for i, page in enumerate(pages or []):
                page_num = page["page_num"]
                text = page["text"] or ""
                doc_items.extend(self.parser.extract_items(text, page_num))
                tables = (page_tables or [])[i] if page_tables and i < len(page_tables) else []
                if tables:
                    doc_items.extend(self.parser.parse_tables(tables, page_num))
            for it in doc_items:
                out_urls.append(url)
                items.append(it)

        qty_int, qty_ref = _qty_columns(items)
        model = [
            (m.strip().upper() if m else None)  # validator upper-cases
            for m in (it.get("model_number") for it in items)
        ]
        return pa.table(
            {
                "url": pa.array(out_urls, pa.string()),
                "fixture_type": pa.array(
                    [(it.get("fixture_type") or None) for it in items], pa.string()
                ),
                "qty_int": pa.array(qty_int, pa.int64()),
                "qty_ref": pa.array(qty_ref, pa.string()),
                "model_number": pa.array(model, pa.string()),
                "dimensions": pa.array(
                    [(it.get("dimensions") or None) for it in items], pa.string()
                ),
                "mounting_type": pa.array(
                    [(it.get("mounting_type") or None) for it in items], pa.string()
                ),
                "spec_reference": pa.array(
                    [(it.get("spec_reference") or None) for it in items], pa.string()
                ),
                "page_number": pa.array(
                    [it.get("page_number", 1) for it in items], pa.int32()
                ),
                "table_number": pa.array(
                    [it.get("table_number") for it in items], pa.int32()
                ),
                "row_number": pa.array(
                    [it.get("row_number") for it in items], pa.int32()
                ),
                "line_number": pa.array(
                    [it.get("line_number") for it in items], pa.int32()
                ),
                "raw_text": pa.array(
                    [it.get("raw_text") for it in items], pa.string()
                ),
            },
            schema=ITEMS_SCHEMA,
        )


class EntitiesStage:
    """Extract-output batch → entities batch (six list<string> columns)."""

    def __init__(self) -> None:
        self.parser = EntityParser()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("extracted_text").to_pylist()
        cols: Dict[str, list] = {k: [] for k in ENTITY_KINDS}
        for text in texts:
            ents = self.parser.extract_entities(text or "")
            # map reference kinds → schema names ('url' column clashes
            # with the document url, hence 'url_ref')
            cols["email"].append(ents.get("email", []))
            cols["phone"].append(ents.get("phone", []))
            cols["date"].append(ents.get("date", []))
            cols["currency"].append(ents.get("currency", []))
            cols["url_ref"].append(ents.get("url", []))
            cols["ssn"].append(ents.get("ssn", []))
        out = {"url": batch.column("url")}
        for k in ENTITY_KINDS:
            out[k] = pa.array(cols[k], pa.list_(pa.string()))
        return pa.table(out)
