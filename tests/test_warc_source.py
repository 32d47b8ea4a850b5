"""WARC source: authored archives round-trip through the extraction
pipeline (plain and per-record-gzip variants)."""
from __future__ import annotations

import datetime as dt

from pdf_extractor_ray.sources.warc import build_warc, parse_warc_bytes

HTML_A = (
    b"<html><body><p>plenty of words in this paragraph make it count as "
    b"real content for the scorer</p></body></html>"
)
PDF_MAGIC_DOC = b"%PDF-1.4 not really a full pdf"

RECORDS = [
    ("https://a.example/page", "2025-03-01T12:00:00Z", HTML_A),
    ("https://b.example/doc.pdf", "2025-03-02T00:30:00Z", PDF_MAGIC_DOC),
]


def test_parse_warc_plain_and_gzip():
    for gz in (False, True):
        pages = parse_warc_bytes(build_warc(RECORDS, gzip_members=gz))
        assert [p["url"] for p in pages] == [r[0] for r in RECORDS]
        assert pages[0]["html"] == HTML_A  # HTTP headers stripped
        assert pages[0]["warc_ts"] == dt.datetime(2025, 3, 1, 12, 0, tzinfo=dt.timezone.utc).replace(tzinfo=None)
        assert pages[1]["html"][:5] == b"%PDF-"


def test_parse_warc_skips_non_response_and_garbage():
    warc = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
        + build_warc(RECORDS[:1])
        + b"trailing garbage not a record"
    )
    pages = parse_warc_bytes(warc)
    assert len(pages) == 1 and pages[0]["url"] == RECORDS[0][0]


def test_warc_to_extraction_pipeline(ray_session, tmp_path):
    from pdf_extractor_ray.pipelines.extraction import extraction_pipeline
    from pdf_extractor_ray.sources.warc import pages_from_warc

    (tmp_path / "shard-00000.warc.gz").write_bytes(build_warc(RECORDS, gzip_members=True))
    df = (
        extraction_pipeline(pages_from_warc([str(tmp_path)]))
        .to_pandas()
        .set_index("url")
    )
    assert len(df) == 2
    a = df.loc["https://a.example/page"]
    assert a["doc_kind"] == "html" and a["extract_status"] == "ok"
    assert "plenty of words" in a["extracted_text"]
    b = df.loc["https://b.example/doc.pdf"]
    assert b["doc_kind"] == "pdf" and b["extract_status"] == "parse_error"


def test_warc_roundtrip_property():
    """Property: random record sets round-trip through build+parse."""
    from hypothesis import given, settings, strategies as st

    payload_st = st.binary(min_size=0, max_size=300)
    url_st = st.from_regex(r"https://[a-z]{3,8}\.example/[a-z0-9]{0,12}", fullmatch=True)

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.tuples(url_st, payload_st), min_size=0, max_size=6),
           st.booleans())
    def check(recs, gz):
        records = [(u, "2025-06-01T00:00:00Z", p) for u, p in recs]
        pages = parse_warc_bytes(build_warc(records, gzip_members=gz))
        assert [p["url"] for p in pages] == [u for u, _ in recs]
        assert [p["html"] for p in pages] == [p2 for _, p2 in recs]

    check()


# ------------------------------------------------------------- WET sink
def test_wet_write_roundtrip_and_idempotence(ray_session, tmp_path):
    import datetime as dt
    import os

    import pyarrow as pa
    import ray.data

    from pdf_extractor_ray.sources.warc import texts_from_wet, write_wet

    ds = ray.data.from_arrow(pa.table({
        "url": pa.array([f"https://x/{i}" for i in range(5)], pa.string()),
        "warc_ts": pa.array(
            [dt.datetime(2025, 1, 1, i) for i in range(5)], pa.timestamp("us")
        ),
        "extracted_text": pa.array(
            ["alpha\n\nbeta", "", "ø unicode", "d", "e"], pa.large_string()
        ),
    }))
    out = str(tmp_path / "wet")
    man1 = write_wet(ds, out).to_pandas()
    assert man1["n_records"].sum() == 5
    files1 = sorted(os.listdir(out))
    back = texts_from_wet([out]).to_pandas().sort_values("url").reset_index(drop=True)
    assert back["text"].tolist() == ["alpha\n\nbeta", "", "ø unicode", "d", "e"]
    assert back["warc_ts"].tolist()[2] == dt.datetime(2025, 1, 1, 2)
    # identical input rewrites the identical file set (resume-safe names)
    write_wet(ds, out).to_pandas()
    assert sorted(os.listdir(out)) == files1


def test_wet_empty_text_and_empty_block(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from pdf_extractor_ray.sources.warc import write_wet

    empty = ray.data.from_arrow(pa.table({
        "url": pa.array([], pa.string()),
        "warc_ts": pa.array([], pa.timestamp("us")),
        "extracted_text": pa.array([], pa.large_string()),
    }))
    man = write_wet(empty, str(tmp_path / "w2")).to_pandas()
    assert len(man) == 0


def test_http_chunked_body_dechunked():
    from pdf_extractor_ray.sources.warc import parse_warc_bytes

    body = b"5\r\nhello\r\n7\r\n, world\r\n0\r\n\r\n"
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n" + body)
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://x/\r\n"
           b"WARC-Date: 2025-01-01T00:00:00Z\r\n"
           b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
           + http + b"\r\n\r\n")
    pages = parse_warc_bytes(rec)
    assert pages[0]["html"] == b"hello, world"


def test_http_chunked_malformed_degrades():
    from pdf_extractor_ray.sources.warc import _dechunk

    assert _dechunk(b"not-a-chunk-framing") == b"not-a-chunk-framing"
    assert _dechunk(b"") == b""


def test_non_2xx_responses_dropped_by_default(ray_session, tmp_path):
    from pdf_extractor_ray.sources.warc import pages_from_warc

    def rec(url, status, body):
        http = (f"HTTP/1.1 {status} X\r\nContent-Type: text/html\r\n\r\n"
                ).encode() + body
        return (b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Target-URI: " + url.encode() + b"\r\n"
                b"WARC-Date: 2025-01-01T00:00:00Z\r\n"
                b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
                + http + b"\r\n\r\n")

    blob = (rec("https://a/ok", 200, b"<html>ok</html>")
            + rec("https://a/gone", 404, b"<html>404</html>")
            + rec("https://a/moved", 301, b""))
    p = tmp_path / "t.warc"
    p.write_bytes(blob)
    kept = pages_from_warc([str(p)]).to_pandas()
    assert kept.url.tolist() == ["https://a/ok"]
    everything = pages_from_warc([str(p)], ok_only=False).to_pandas()
    assert len(everything) == 3


def test_corpus_warc_roundtrip_extraction_byte_identical(ray_session, tmp_path):
    """Synthesized pages serialized as a gzip WARC, read back through
    pages_from_warc, extracted — byte-identical to the goldens
    (integration across source → router → codecs, incl. PDF rows)."""
    import pyarrow as pa

    from pdf_extractor_ray.pipelines.extraction import extraction_pipeline
    from pdf_extractor_ray.sources.corpus import PageSynthesizer
    from pdf_extractor_ray.sources.warc import build_warc, pages_from_warc

    batch = pa.table({
        "doc_id": pa.array(list(range(20, 40)), pa.int64()),
        "text": pa.array([" ".join(f"w{i}" for i in range(40))] * 20),
        "lang": pa.array(["en"] * 20),
    })
    pages = PageSynthesizer()(batch)
    goldens = dict(zip(pages.column("url").to_pylist(),
                       pages.column("text").to_pylist()))
    records = [
        (u, "2025-01-01T00:00:00Z", p or b"")
        for u, p in zip(pages.column("url").to_pylist(),
                        pages.column("html").to_pylist())
    ]
    p = tmp_path / "corpus.warc.gz"
    p.write_bytes(build_warc(records, gzip_members=True))
    ds = pages_from_warc([str(p)])
    out = extraction_pipeline(ds).to_pandas()
    assert len(out) == 20
    ok = out[out.extract_status == "ok"]
    assert len(ok) >= 18  # the range includes pdf rows (27, 37) — all ok
    for _, r in ok.iterrows():
        assert r.extracted_text == goldens[r.url], r.url


def test_wet_bytes_member_boundaries_resume_points():
    """Each conversion record is its own gzip member — any member
    boundary is a valid split/resume point (the WET convention)."""
    from pdf_extractor_ray.sources.warc import (
        _split_gzip_members,
        parse_warc_bytes,
        wet_bytes,
    )

    blob = wet_bytes([
        ("https://a/1", "2025-01-01T00:00:00Z", "one"),
        ("https://a/2", "2025-01-01T00:00:01Z", "two"),
    ])
    members = list(_split_gzip_members(blob))
    assert len(members) == 2
    # the SECOND member alone parses independently of the first
    rec2 = parse_warc_bytes(members[1], is_gzip=False,
                            record_type="conversion")
    assert [r["url"] for r in rec2] == ["https://a/2"]
    assert rec2[0]["html"] == b"two"
