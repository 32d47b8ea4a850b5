"""Per-document JSON output (M17 filename parity) + inspection surface."""
from __future__ import annotations

import glob
import json
import os


def test_filename_derivation_reference_parity():
    """Engine derivation == reference generate_output_filename
    (reference main.py:27-39: Path(input).stem + '_extracted.json')
    over a table of representative inputs."""
    from pathlib import Path

    from pdf_extractor_ray.pipelines.extraction import derive_output_filename

    cases = [
        "document.pdf", "sample-pages.pdf", "a.b.c.pdf", "noext",
        "spec_v2.PDF", "archive.tar.gz",
    ]
    for name in cases:
        expect = f"{Path(name).stem}_extracted.json"
        # plain path input
        assert derive_output_filename(name) == expect
        # the same document addressed by url
        assert derive_output_filename(f"https://host.example/docs/{name}") == expect


def test_write_per_doc_json_construction(ray_session, tmp_path):
    import ray.data

    from pdf_extractor_ray.pipelines.extraction import (
        construction_result_pipeline,
        write_per_doc_json,
    )
    from pdf_extractor_ray.sources.corpus import pages_dataset

    pages = pages_dataset("/root/testdata/sf0.001").limit(40)
    out_dir = str(tmp_path / "perdoc")
    n = write_per_doc_json(construction_result_pipeline(pages), out_dir)
    files = sorted(glob.glob(f"{out_dir}/*_extracted.json"))
    assert n == 40 and len(files) >= 1
    payload = json.load(open(files[0], encoding="utf-8"))
    # reference ConstructionExtractionResult envelope shape
    assert payload["extraction_mode"] == "construction"
    assert set(payload) >= {"total_items_found", "items", "summary", "statistics"}
    assert set(payload["statistics"]) == {
        "total_pages", "total_characters", "total_words",
        "avg_chars_per_page", "avg_words_per_page",
    }
    assert "url" not in payload  # scrubbed like the reference's source_pdf
    assert payload["total_items_found"] == len(payload["items"])


def test_cli_inspect_single_doc(ray_session, capsys):
    import glob as _glob

    import pyarrow.parquet as pq

    from pdf_extractor_ray.cli import main
    from pdf_extractor_ray.sources.corpus import synthesize_pages

    pages_dir = synthesize_pages("/root/testdata/sf0.001", "/tmp/pages_sf0001")
    pages_file = sorted(_glob.glob(f"{pages_dir}/*.parquet"))[0]
    url = pq.read_table(pages_file, columns=["url"]).column("url")[0].as_py()
    rc = main([
        "--input", pages_file, "--output", "/tmp/unused-inspect",
        "--mode", "standard", "--inspect", url,
    ])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload["extraction_mode"] == "standard"
    assert "full_text" in payload and "statistics" in payload

    rc = main([
        "--input", pages_file, "--output", "/tmp/unused-inspect",
        "--mode", "standard", "--inspect", "https://no-such-url.example/",
    ])
    assert rc == 2
