"""Enrich-merge of two item sources per document (SURVEY §2.4 J1-J3).

The reference greedily matches regex-extracted items against
LLM-extracted items and coalesces fields (reference:
extractor/services/extraction_service.py:318-447): score = fixture
equality +10 / containment +5, model equality +8 / containment +4,
page equality +3; threshold ≥3; each secondary item consumed at most
once (greedy in primary order); merged fields keep the LONGER string
on conflict; unmatched secondary items are appended iff they carry a
page_number or fixture_type (anti-join add).

The engine generalizes "regex vs LLM" to ANY two extraction sources
over the same corpus. The match is order-dependent and doc-local, so
it distributes as ``groupby('url').map_groups`` — the shuffle key is
the document, group payload is a handful of item rows, never the
document text. At 100 TB the shuffled bytes are items only.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import pyarrow as pa

_MERGE_FIELDS = (
    "fixture_type",
    "quantity",
    "model_number",
    "dimensions",
    "mounting_type",
    "spec_reference",
)
_META_FIELDS = ("page_number", "table_number", "row_number", "line_number", "raw_text")


def match_score(a: Dict[str, Any], b: Dict[str, Any]) -> int:
    """Reference scoring (extraction_service.py:360-411)."""
    score = 0
    fa = (a.get("fixture_type") or "").lower().strip()
    fb = (b.get("fixture_type") or "").lower().strip()
    if fa and fb:
        if fa == fb:
            score += 10
        elif fa in fb or fb in fa:
            score += 5
    ma = (a.get("model_number") or "").upper().strip()
    mb = (b.get("model_number") or "").upper().strip()
    if ma and mb:
        if ma == mb:
            score += 8
        elif ma in mb or mb in ma:
            score += 4
    if a.get("page_number") and a.get("page_number") == b.get("page_number"):
        score += 3
    return score


def _longer(x: Optional[str], y: Optional[str]) -> Optional[str]:
    if x is None:
        return y
    if y is None:
        return x
    return x if len(str(x)) >= len(str(y)) else y


def merge_item_fields(primary: Dict[str, Any], secondary: Dict[str, Any]) -> Dict[str, Any]:
    """Coalesce per field; primary metadata always preserved; conflict →
    longer string (reference :413-447)."""
    out = dict(primary)
    for f in _MERGE_FIELDS:
        pv, sv = primary.get(f), secondary.get(f)
        if pv is None:
            out[f] = sv
        elif sv is not None and isinstance(pv, str) and isinstance(sv, str):
            out[f] = _longer(pv, sv)
    return out


def merge_item_lists(
    primary: List[Dict[str, Any]],
    secondary: List[Dict[str, Any]],
    threshold: int = 3,
) -> List[Dict[str, Any]]:
    """Greedy best-match merge of one document's two item lists."""
    used: set = set()
    merged: List[Dict[str, Any]] = []
    for item in primary:
        best_idx, best_score = None, threshold - 1
        for j, cand in enumerate(secondary):
            if j in used:
                continue
            s = match_score(item, cand)
            if s > best_score:
                best_idx, best_score = j, s
        if best_idx is not None:
            used.add(best_idx)
            merged.append(merge_item_fields(item, secondary[best_idx]))
        else:
            merged.append(dict(item))
    # anti-join add (reference :350-357)
    for j, cand in enumerate(secondary):
        if j not in used and (cand.get("page_number") or cand.get("fixture_type")):
            merged.append(dict(cand))
    return merged


def count_filled_fields(items: List[Dict[str, Any]]) -> int:
    """G7 improvement metric: non-null merge-field count (reference
    decides 'merge actually worked' by comparing this before/after,
    extraction_service.py:299-316)."""
    return sum(
        1 for it in items for f in _MERGE_FIELDS if it.get(f) is not None
    )


# ------------------------------------------------------------- Ray wrapper
def _row_to_item(row: Dict[str, Any]) -> Dict[str, Any]:
    item = {f: row.get(f) for f in _MERGE_FIELDS + _META_FIELDS if f in row}
    # reconstruct Union[int,str] quantity from the dual encoding
    if "qty_int" in row or "qty_ref" in row:
        item["quantity"] = row.get("qty_int") if row.get("qty_int") is not None else row.get("qty_ref")
    return item


def _item_to_row(url: str, source: str, item: Dict[str, Any]) -> Dict[str, Any]:
    q = item.get("quantity")
    return {
        "url": url,
        "source": source,
        "fixture_type": item.get("fixture_type"),
        "qty_int": q if isinstance(q, int) else None,
        "qty_ref": q if isinstance(q, str) else None,
        "model_number": item.get("model_number"),
        "dimensions": item.get("dimensions"),
        "mounting_type": item.get("mounting_type"),
        "spec_reference": item.get("spec_reference"),
        "page_number": item.get("page_number") or 1,
        "line_number": item.get("line_number"),
    }


_MERGED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("source", pa.string()),
        ("fixture_type", pa.string()),
        ("qty_int", pa.int64()),
        ("qty_ref", pa.string()),
        ("model_number", pa.string()),
        ("dimensions", pa.string()),
        ("mounting_type", pa.string()),
        ("spec_reference", pa.string()),
        ("page_number", pa.int32()),
        ("line_number", pa.int32()),
    ]
)


def _merge_group(group: pa.Table, threshold: int) -> pa.Table:
    rows = group.to_pylist()
    url = rows[0]["url"]
    prim = [_row_to_item(r) for r in rows if r["source"] == "primary"]
    sec = [_row_to_item(r) for r in rows if r["source"] == "secondary"]
    # deterministic in-group order regardless of shuffle arrival
    prim.sort(key=lambda r: (r.get("page_number") or 0, r.get("line_number") or 0))
    sec.sort(key=lambda r: (r.get("page_number") or 0, r.get("line_number") or 0))
    merged = merge_item_lists(prim, sec, threshold)
    out = [_item_to_row(url, "merged", it) for it in merged]
    if not out:
        return _MERGED_SCHEMA.empty_table()
    return pa.Table.from_pylist(out, schema=_MERGED_SCHEMA)


def merge_tagged(tagged_ds, threshold: int = 3):
    """One item Dataset already carrying ``source`` ∈ {primary,
    secondary} → merged items Dataset.

    Prefer this over :func:`merge_sources` when both sources derive
    from the SAME upstream pipeline (e.g. line-items vs table-items of
    one extraction run): tagging in a single map_batches avoids
    executing the upstream plan twice (union branches re-execute their
    whole lineage).
    """
    return tagged_ds.groupby("url").map_groups(
        lambda g: _merge_group(g, threshold), batch_format="pyarrow"
    )


def merge_sources(primary_ds, secondary_ds, threshold: int = 3):
    """Two item Datasets (ITEMS_SCHEMA-like, keyed by url) → merged
    items Dataset. Tags rows, unions, groups per url, merges in-group.
    """

    def tag(source: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "source", pa.array([source] * batch.num_rows, pa.string())
            )

        return fn

    both = primary_ds.map_batches(tag("primary"), batch_format="pyarrow").union(
        secondary_ds.map_batches(tag("secondary"), batch_format="pyarrow")
    )
    return merge_tagged(both, threshold)
