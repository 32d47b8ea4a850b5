"""Raw-file source: directories of .pdf/.html files → pages → extraction."""
from __future__ import annotations

from pdf_extractor_ray.fixtures.pdf_build import simple_text_pdf


def test_pages_from_files_extraction(ray_session, tmp_path):
    from pdf_extractor_ray.pipelines.extraction import extraction_pipeline
    from pdf_extractor_ray.sources.files import pages_from_files

    lines = [["alpha beta gamma delta", "epsilon zeta eta theta"]]
    (tmp_path / "doc1.pdf").write_bytes(simple_text_pdf(lines))
    (tmp_path / "doc2.html").write_bytes(
        b"<html><body><h1>Title words here</h1>"
        b"<p>ten content words are needed for the block threshold here</p>"
        b"</body></html>"
    )
    (tmp_path / "broken.pdf").write_bytes(b"%PDF-1.4 truncated")

    df = (
        extraction_pipeline(pages_from_files([str(tmp_path)]))
        .to_pandas()
        .set_index("url")
    )
    assert len(df) == 3
    pdf_row = df.loc[f"file://{tmp_path}/doc1.pdf"]
    assert pdf_row["doc_kind"] == "pdf" and pdf_row["extract_status"] == "ok"
    assert pdf_row["extracted_text"] == "\n".join(lines[0])
    html_row = df.loc[f"file://{tmp_path}/doc2.html"]
    assert html_row["doc_kind"] == "html" and html_row["extract_status"] == "ok"
    assert "ten content words" in html_row["extracted_text"]
    broken = df.loc[f"file://{tmp_path}/broken.pdf"]
    assert broken["doc_kind"] == "pdf" and broken["extract_status"] == "parse_error"
