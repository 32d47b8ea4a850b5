"""Golden unit tests for the from-scratch PDF codec (no Ray needed).

Fixture PDFs are authored byte-by-byte (fixtures/pdf_build.py) so the
expected text is known at generation time (SURVEY.md §5.2).
"""
from __future__ import annotations

from pdf_extractor_ray.codecs.pdf_codec import PdfCodec, has_table_indicators
from pdf_extractor_ray.fixtures.pdf_build import (
    PdfPage,
    build_pdf,
    simple_text_pdf,
    table_pdf,
    two_column_pdf,
)

codec = PdfCodec()


def test_simple_text_byte_identical():
    pdf = simple_text_pdf([["Hello world", "Second line here"], ["Page two line"]])
    r = codec.extract(pdf)
    assert r.status == "ok"
    assert r.text == "Hello world\nSecond line here\n\nPage two line"
    assert [p.page_num for p in r.pages] == [1, 2]
    assert r.pages[0].width == 612.0 and r.pages[0].height == 792.0


def test_tj_array_reinserts_spaces():
    pdf = simple_text_pdf([["alpha beta gamma"]], use_tj=True)
    assert codec.extract(pdf).text == "alpha beta gamma"


def test_leading_t_star():
    pdf = simple_text_pdf([["one", "two", "three"]], use_leading=True)
    assert codec.extract(pdf).text == "one\ntwo\nthree"


def test_uncompressed_stream():
    pdf = build_pdf([PdfPage(texts=[(72, 700, 12, "plain uncompressed")])], compress=False)
    assert codec.extract(pdf).text == "plain uncompressed"


def test_two_column_reading_order():
    pdf = two_column_pdf(
        ["L1 left col", "L2 left col", "L3 left col"],
        ["R1 right", "R2 right", "R3 right"],
    )
    r = codec.extract(pdf)
    assert r.text == "L1 left col\nL2 left col\nL3 left col\nR1 right\nR2 right\nR3 right"


def test_ruled_table_grid():
    pdf = table_pdf(
        [["Item", "Qty", "Model"], ["VALVE", "2", "VP-100"]],
        prefix_lines=["SCHEDULE OF FIXTURES"],
    )
    r = codec.extract(pdf)
    assert r.tables == [[["Item", "Qty", "Model"], ["VALVE", "2", "VP-100"]]]
    assert r.text == "SCHEDULE OF FIXTURES\nItem | Qty | Model\nVALVE | 2 | VP-100"


def test_table_nullable_cells():
    pdf = table_pdf([["A", "", "C"]])
    r = codec.extract(pdf)
    assert r.tables == [[["A", None, "C"]]]


def test_spans_offsets_into_utf8_bytes():
    pdf = simple_text_pdf([["Hello world", "Second line"]])
    r = codec.extract(pdf)
    raw = r.text.encode("utf-8")
    assert [raw[s:e].decode() for (_b, s, e, _k) in r.spans] == ["Hello world", "Second line"]
    kinds = {k for (_b, _s, _e, k) in r.spans}
    assert kinds == {"line"}


def test_degrade_on_truncated_pdf():
    pdf = simple_text_pdf([["Hello"]])
    r = codec.extract(pdf[:40])
    assert r.status == "parse_error"
    assert r.text == ""


def test_truncated_xref_recovers_via_scan():
    pdf = simple_text_pdf([["Recoverable content line"]])
    # chop inside the xref table: objects intact, xref broken
    cut = pdf.rfind(b"xref") + 20
    r = codec.extract(pdf[:cut])
    assert r.text == "Recoverable content line"


def test_not_a_pdf():
    assert codec.extract(b"<html>nope</html>").status == "parse_error"


def test_table_indicator_gate():
    assert has_table_indicators("a\tb")
    assert has_table_indicators("|" * 16)
    assert not has_table_indicators("plain prose " * 10)


def test_stream_data_ending_in_eol_bytes():
    """Regression: compressed stream data whose LAST byte is \\r or \\n
    must not be eaten by the endstream EOL-trim heuristic when /Length
    is present (found via sf0.1 byte-identity: doc_ids 897, 3927)."""
    import zlib

    from pdf_extractor_ray.codecs.pdf_codec import PdfCodec

    # brute-force flate output ending in \r or \n (vary a content
    # comment to walk the adler32 trailer), plus an uncompressed
    # stream literally ending in \r
    found = {}
    for i in range(200000):
        content = (
            f"BT\n/F1 10 Tf\n50 720 Td\n(line one) Tj\nET\n% {i} pad\n".encode()
        )
        comp = zlib.compress(content)
        last = comp[-1:]
        if last in (b"\r", b"\n") and last not in found:
            found[last] = (content, comp, b"/Filter /FlateDecode ")
        if len(found) == 2:
            break
    assert found, "no deflate output ending in EOL byte found"
    raw_cr = b"BT\n/F1 10 Tf\n50 720 Td\n(line raw) Tj\nET\r"
    found[b"raw"] = (raw_cr, raw_cr, b"")

    for content, comp, filt in found.values():
        pdf = (
            b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length " + str(len(comp)).encode() + b" " + filt +
            b">>\nstream\n" + comp + b"\nendstream\nendobj\n"
            b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
            b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
        )
        r = PdfCodec().extract(pdf)
        assert r.status == "ok"
        assert r.text.startswith("line ")


def test_modern_pdf_xref_stream_and_objstm():
    """PDF ≥1.5: cross-reference STREAM (type-1/2 entries, W triples)
    with catalog/pages/page/font packed in an object stream — both with
    and without the PNG Up predictor on the xref stream."""
    from pdf_extractor_ray.codecs.pdf_codec import PdfCodec
    from pdf_extractor_ray.fixtures.pdf_build import modern_text_pdf

    lines = ["modern xref stream works", "object streams too", "third line"]
    for predictor in (True, False):
        r = PdfCodec().extract(modern_text_pdf(lines, predictor=predictor))
        assert r.status == "ok", predictor
        assert r.text == "\n".join(lines)


def test_modern_pdf_truncated_degrades():
    from pdf_extractor_ray.codecs.pdf_codec import PdfCodec
    from pdf_extractor_ray.fixtures.pdf_build import modern_text_pdf

    whole = modern_text_pdf(["some line of text"])
    for cut in (60, len(whole) // 2, len(whole) - 30):
        r = PdfCodec().extract(whole[:cut])
        assert r.status in ("ok", "empty", "parse_error")  # never raises


def test_giant_document_500_pages():
    """Memory/perf smoke: a 500-page document extracts correctly and in
    bounded time (the giant-PDF skew case at 16x the corpus giants)."""
    pages = [[f"page {p} line {i} words here" for i in range(6)] for p in range(500)]
    pdf = simple_text_pdf(pages)
    r = codec.extract(pdf)
    assert r.status == "ok"
    assert len(r.pages) == 500
    assert r.text == "\n\n".join("\n".join(ls) for ls in pages)


# ------------------------------------------------------------- Info dict
def test_extract_info_classic_and_modern():
    from pdf_extractor_ray.codecs.pdf_codec import extract_info
    from pdf_extractor_ray.fixtures.pdf_build import (
        modern_text_pdf,
        simple_text_pdf,
    )

    info = {"Title": "T (one)", "Author": "A", "Subject": "S",
            "Keywords": "k1 k2", "Creator": "C", "Producer": "P"}
    for payload in (
        simple_text_pdf([["x"]], info=info),      # trailer-referenced obj
        modern_text_pdf(["x"], info=info),        # Info inside ObjStm
        modern_text_pdf(["x"], predictor=True, info=info),
    ):
        got = extract_info(payload)
        assert got == {
            "title": "T (one)", "author": "A", "subject": "S",
            "keywords": "k1 k2", "creator": "C", "producer": "P",
        }


def test_extract_info_absent_and_broken():
    from pdf_extractor_ray.codecs.pdf_codec import extract_info
    from pdf_extractor_ray.fixtures.pdf_build import image_only_pdf, simple_text_pdf

    none = {k: None for k in
            ("title", "author", "subject", "keywords", "creator", "producer")}
    assert extract_info(simple_text_pdf([["x"]])) == none
    assert extract_info(image_only_pdf()) == none
    assert extract_info(b"%PDF-1.4 garbage") == none
    assert extract_info(b"not a pdf at all") == none


def test_extract_info_utf16_and_escapes():
    from pdf_extractor_ray.codecs.pdf_codec import extract_info
    from pdf_extractor_ray.fixtures.pdf_build import build_pdf, PdfPage

    # hand-patch a UTF-16BE hex-string title into a built PDF's Info
    base = build_pdf([PdfPage(texts=[(72.0, 720.0, 12.0, "x")])],
                     info={"Title": "placeholder"})
    utf16 = "café".encode("utf-16-be")
    hexstr = "<FEFF" + utf16.hex().upper() + ">"
    patched = base.replace(b"(placeholder)", hexstr.encode("ascii"))
    assert extract_info(patched)["title"] == "café"


def test_info_does_not_change_extracted_text():
    from pdf_extractor_ray.codecs.pdf_codec import PdfCodec
    from pdf_extractor_ray.fixtures.pdf_build import simple_text_pdf

    lines = [["alpha beta", "gamma delta"]]
    with_info = PdfCodec().extract(
        simple_text_pdf(lines, info={"Title": "t"})).text
    without = PdfCodec().extract(simple_text_pdf(lines)).text
    assert with_info == without == "alpha beta\ngamma delta"


# ----------------------------------------------------- stream filters
def test_all_stream_filters_decode_identically():
    """Every filter the codec supports (incl. the [A85, Flate] array
    and filter+RC4 combinations) yields byte-identical text."""
    from pdf_extractor_ray.codecs.pdf_codec import PdfCodec
    from pdf_extractor_ray.fixtures.pdf_build import PdfPage, build_pdf

    pages = [PdfPage(texts=[
        (72.0, 720.0 - 14 * i, 12.0, f"line {i} with repeated aaaaaa bytes")
        for i in range(8)
    ])]
    want = PdfCodec().extract(build_pdf(pages)).text
    assert want
    for filt in ("flate", "lzw", "ahx", "rle", "a85+flate"):
        for enc in (False, True):
            got = PdfCodec().extract(
                build_pdf(pages, stream_filter=filt, encrypt=enc))
            assert got.status == "ok" and got.text == want, (filt, enc)


def test_lzw_encoder_width_boundaries():
    """Encoder/decoder early-change parity across 9→10→11→12-bit
    boundaries and the frozen-table regime."""
    import random

    from pdf_extractor_ray.codecs.pdf_codec import _lzw_decode
    from pdf_extractor_ray.fixtures.pdf_build import _lzw_encode

    rng = random.Random(11)
    for n in (0, 1, 300, 2000, 20000, 60000):
        d = bytes(rng.randrange(5) for _ in range(n))
        assert _lzw_decode(_lzw_encode(d)) == d, n


def test_rle_encoder_roundtrip():
    import random

    from pdf_extractor_ray.codecs.pdf_codec import _rle_decode
    from pdf_extractor_ray.fixtures.pdf_build import _rle_encode

    rng = random.Random(3)
    for n in (0, 1, 2, 129, 500, 5000):
        d = bytes(rng.randrange(3) for _ in range(n))
        assert _rle_decode(_rle_encode(d)) == d, n
    assert _rle_decode(_rle_encode(b"x" * 1000)) == b"x" * 1000


def test_extract_links_annots():
    """Page /Annots URI actions extract in page order, de-duplicated,
    across classic/modern containers and both encryption handlers."""
    from pdf_extractor_ray.codecs.pdf_codec import extract_links
    from pdf_extractor_ray.fixtures.pdf_build import (
        PdfPage,
        build_pdf,
        modern_text_pdf,
    )

    L = ["https://x/1", "https://x/2"]
    p = PdfPage(texts=[(72.0, 720.0, 12.0, "t")], links=L + ["https://x/1"])
    assert extract_links(build_pdf([p])) == L
    assert extract_links(build_pdf([p], encrypt=True)) == L
    assert extract_links(build_pdf([p], encrypt="aes")) == L
    assert extract_links(modern_text_pdf(["t"], info={"Title": "i"}, links=L)) == L
    assert extract_links(build_pdf([PdfPage(texts=[(72.0, 720.0, 12.0, "t")])])) == []
    assert extract_links(b"not a pdf") == []


def test_outlink_stage_reads_pdf_annots(ray_session):
    import pyarrow as pa

    from pdf_extractor_ray.fixtures.pdf_build import PdfPage, build_pdf
    from pdf_extractor_ray.functions.url import OutlinkStage

    pdf = build_pdf([PdfPage(texts=[(72.0, 720.0, 12.0, "t")],
                             links=["https://t/a", "/rel"])])
    batch = pa.table({
        "url": pa.array(["https://src/doc.pdf"], pa.string()),
        "html": pa.array([pdf], pa.large_binary()),
    })
    out = OutlinkStage()(batch)
    assert out.column("dst_url").to_pylist() == [
        "https://t/a", "https://src/rel"]  # relative URIs resolve


def test_extract_outline_order_and_encryption():
    from pdf_extractor_ray.codecs.pdf_codec import extract_outline
    from pdf_extractor_ray.fixtures.pdf_build import PdfPage, build_pdf

    p = [PdfPage(texts=[(72.0, 720.0, 12.0, "x")])]
    for enc in (False, True, "aes"):
        pdf = build_pdf(p, outline=["Intro", "Methods", "Results"],
                        encrypt=enc)
        assert extract_outline(pdf) == ["Intro", "Methods", "Results"], enc
    assert extract_outline(build_pdf(p)) == []
    assert extract_outline(b"junk") == []


def test_extract_info_indirect_string_values_encrypted():
    """Info values stored as indirect refs to string objects decrypt
    with the STRING object's num/gen, not the Info dict's (PDF 32000-1
    §7.6.2; ADVICE r3). Covers plain, RC4 and AESV2."""
    from pdf_extractor_ray.codecs.pdf_codec import extract_info
    from pdf_extractor_ray.fixtures.pdf_build import PdfPage, build_pdf

    info = {"Title": "Indirect T", "Author": "Ind A"}
    pages = [PdfPage(texts=[(72.0, 720.0, 12.0, "x")])]
    for enc in (False, True, "aes"):
        payload = build_pdf(pages, info=info, encrypt=enc,
                            indirect_info=True)
        got = extract_info(payload)
        assert got["title"] == "Indirect T", f"encrypt={enc}"
        assert got["author"] == "Ind A", f"encrypt={enc}"
