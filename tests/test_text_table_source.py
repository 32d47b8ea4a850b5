"""CSV / JSONL document sources: normalization + downstream compatibility."""
from __future__ import annotations

import json

import pyarrow as pa


def test_jsonl_source_normalizes_and_feeds_dedup(ray_session, tmp_path):
    from pdf_extractor_ray.functions.dedup import exact_dedup
    from pdf_extractor_ray.sources.text_table import documents_from_jsonl

    p = tmp_path / "docs.jsonl"
    rows = [
        {"doc_id": 1, "text": "hello world", "lang": "en"},
        {"doc_id": 2, "text": "hello world", "lang": "en"},   # exact dup
        {"doc_id": 3, "text": "something else", "lang": None},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    ds = documents_from_jsonl(str(p))
    df = ds.to_pandas().sort_values("doc_id")
    assert list(df["lang"]) == ["en", "en", "unknown"]
    assert str(df["doc_id"].dtype) == "int64"
    # downstream operators work unchanged
    reps = exact_dedup(documents_from_jsonl(str(p))).to_pandas()
    assert len(reps) == 2  # two distinct texts


def test_csv_source_normalizes(ray_session, tmp_path):
    from pdf_extractor_ray.sources.text_table import documents_from_csv

    p = tmp_path / "docs.csv"
    p.write_text("doc_id,text\n10,alpha beta\n11,gamma delta\n")
    df = documents_from_csv(str(p)).to_pandas().sort_values("doc_id")
    assert list(df["doc_id"]) == [10, 11]
    assert list(df["lang"]) == ["unknown", "unknown"]


def test_source_missing_columns_raises(ray_session, tmp_path):
    import pytest

    from pdf_extractor_ray.sources.text_table import documents_from_csv

    p = tmp_path / "bad.csv"
    p.write_text("id,body\n1,x\n")
    with pytest.raises(Exception):
        documents_from_csv(str(p)).to_pandas()


def test_cli_corpus_prep_from_jsonl(ray_session, tmp_path):
    import glob
    import json
    import random

    from pdf_extractor_ray.cli import main

    rnd = random.Random(3)
    base = ("the quality of the corpus and the text it holds is in the "
            "flow of a whole document full of words " * 3)
    rows = [
        {"doc_id": i, "text": base + " ".join(
            "".join(rnd.choices("abcdefgh", k=5)) for _ in range(10)),
         "lang": "en"}
        for i in range(20)
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    out_dir = str(tmp_path / "prep")
    rc = main(["--input", str(p), "--output", out_dir,
               "--mode", "corpus-prep", "--input-format", "jsonl"])
    assert rc == 0
    import pyarrow.parquet as pq

    n = sum(pq.read_metadata(f).num_rows
            for f in glob.glob(f"{out_dir}/*.parquet"))
    assert 0 < n <= 20
