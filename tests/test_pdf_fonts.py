"""Font decode paths: ToUnicode CMaps, /Encoding /Differences, Form
XObjects — authored fixtures (we own both sides of the codec)."""
from __future__ import annotations

import zlib

from pdf_extractor_ray.codecs.pdf_codec import PdfCodec, _parse_tounicode


def _pdf(objects: list, root: int = 1) -> bytes:
    """Assemble numbered objects + classic trailer."""
    out = bytearray(b"%PDF-1.4\n")
    for num, payload in objects:
        out.extend(f"{num} 0 obj\n".encode() + payload + b"\nendobj\n")
    out.extend(b"trailer\n<< /Root " + str(root).encode() + b" 0 R >>\n%%EOF\n")
    return bytes(out)


def _stream_obj(d: bytes, data: bytes) -> bytes:
    return (
        b"<< " + d + b" /Length " + str(len(data)).encode() + b" >>\nstream\n"
        + data + b"\nendstream"
    )


BASE = [
    (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
    (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
]


def test_tounicode_cmap_two_byte():
    """Type0-style 2-byte codes mapped through a ToUnicode CMap."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"3 beginbfchar\n"
        b"<0001> <0048>\n"  # H
        b"<0002> <0065>\n"  # e
        b"<0003> <00E9>\n"  # e-acute
        b"endbfchar\n"
        b"1 beginbfrange\n"
        b"<0010> <0012> <006C>\n"  # l, m, n
        b"endbfrange\n"
        b"endcmap\nend\n"
    )
    # content shows codes: H e é l m n
    content = b"BT\n/F1 10 Tf\n50 700 Td\n<000100020003001000110012> Tj\nET\n"
    pdf = _pdf(
        BASE
        + [
            (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
            (4, _stream_obj(b"", content)),
            (5, b"<< /Type /Font /Subtype /Type0 /BaseFont /Emb+X "
                b"/ToUnicode 6 0 R >>"),
            (6, _stream_obj(b"", cmap)),
        ]
    )
    r = PdfCodec().extract(pdf)
    assert r.status == "ok"
    assert r.text == "Heélmn"


def test_tounicode_bfrange_array_form():
    table, width = _parse_tounicode(
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"1 beginbfrange\n<41> <43> [<0058> <0059> <005A>]\nendbfrange\n"
    )
    assert width == 1
    assert table == {0x41: "X", 0x42: "Y", 0x43: "Z"}


def test_encoding_differences():
    """Simple font remapping codes via /Differences glyph names."""
    content = b"BT\n/F1 10 Tf\n50 700 Td\n(AB C) Tj\nET\n"
    pdf = _pdf(
        BASE
        + [
            (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
            (4, _stream_obj(b"", content)),
            # A(65)->zero, B(66)->one; space + C untouched (WinAnsi fallthrough)
            (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                b"/Encoding << /Differences [65 /zero /one] >> >>"),
        ]
    )
    r = PdfCodec().extract(pdf)
    assert r.text == "01 C"


def test_form_xobject_text_included():
    """Text drawn inside a Form XObject invoked via Do, with a Matrix
    translation, lands at the right position relative to page text."""
    page_content = b"BT\n/F1 10 Tf\n50 700 Td\n(page line) Tj\nET\n/Fm1 Do\n"
    form_content = b"BT\n/F1 10 Tf\n0 0 Td\n(form line) Tj\nET\n"
    form = _stream_obj(
        b"/Subtype /Form /Matrix [1 0 0 1 50 680] "
        b"/Resources << /Font << /F1 5 0 R >> >>",
        form_content,
    )
    pdf = _pdf(
        BASE
        + [
            (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 5 0 R >> /XObject << /Fm1 6 0 R >> >> "
                b"/Contents 4 0 R >>"),
            (4, _stream_obj(b"", page_content)),
            (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
            (6, form),
        ]
    )
    r = PdfCodec().extract(pdf)
    assert r.text == "page line\nform line"


def test_font_cache_reused_across_documents():
    codec = PdfCodec()

    def one_doc(line: bytes) -> bytes:
        return _pdf(
            BASE
            + [
                (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
                (4, _stream_obj(b"", b"BT\n/F1 10 Tf\n50 700 Td\n(" + line + b") Tj\nET\n")),
                (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                    b"/Encoding << /Differences [65 /zero] >> >>"),
            ]
        )

    assert codec.extract(one_doc(b"A one")).text == "0 one"
    n_cached = len(codec._font_cache)
    assert n_cached == 1
    assert codec.extract(one_doc(b"A two")).text == "0 two"
    assert len(codec._font_cache) == n_cached  # same definition → cache hit


def _filter_pdf(filter_name: bytes, data: bytes) -> bytes:
    content_dict = b"/Filter /" + filter_name
    return _pdf(
        BASE
        + [
            (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
            (4, _stream_obj(content_dict, data)),
            (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
        ]
    )


CONTENT = b"BT\n/F1 10 Tf\n50 700 Td\n(filter roundtrip line) Tj\nET\n"


def test_asciihex_filter():
    r = PdfCodec().extract(_filter_pdf(b"ASCIIHexDecode", CONTENT.hex().encode() + b">"))
    assert r.text == "filter roundtrip line"


def test_ascii85_filter():
    import base64

    enc = base64.a85encode(CONTENT) + b"~>"
    r = PdfCodec().extract(_filter_pdf(b"ASCII85Decode", enc))
    assert r.text == "filter roundtrip line"


def test_runlength_filter():
    # naive RLE encoder: all-literal runs of <=128 bytes
    out = bytearray()
    for i in range(0, len(CONTENT), 128):
        chunk = CONTENT[i : i + 128]
        out += bytes([len(chunk) - 1]) + chunk
    out += bytes([128])
    r = PdfCodec().extract(_filter_pdf(b"RunLengthDecode", bytes(out)))
    assert r.text == "filter roundtrip line"


def test_lzw_filter():
    # encoder mirroring the decoder's table/width evolution
    def lzw_encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        width = 9
        acc = 0
        nbits = 0
        out = bytearray()

        def emit(code: int):
            nonlocal acc, nbits
            acc = (acc << width) | code
            nbits += width
            while nbits >= 8:
                out.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8

        emit(256)  # clear
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
            else:
                emit(table[w])
                table[wc] = next_code
                next_code += 1
                # decoder grows width when len(table) >= (1<<width)-1;
                # its table size is next_code, so mirror exactly
                if next_code >= (1 << width) - 1 and width < 12:
                    width += 1
                w = bytes([ch])
        if w:
            emit(table[w])
        emit(257)  # EOD
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        return bytes(out)

    r = PdfCodec().extract(_filter_pdf(b"LZWDecode", lzw_encode(CONTENT)))
    assert r.text == "filter roundtrip line"


def test_inline_image_skipped():
    """BI/ID/EI inline-image binary data must not pollute extracted
    text (binary can contain bytes that look like text operators)."""
    binary = bytes(range(256)) + b" (fake) Tj BT ET "
    content = (
        b"BT\n/F1 10 Tf\n50 700 Td\n(before image) Tj\nET\n"
        b"BI /W 8 /H 8 /BPC 8 /CS /G ID " + binary + b" EI\n"
        b"BT\n/F1 10 Tf\n50 680 Td\n(after image) Tj\nET\n"
    )
    r = PdfCodec().extract(_filter_pdf(b"FlateDecode", __import__("zlib").compress(content)))
    assert r.text == "before image\nafter image"


def test_bfrange_split_across_lines_and_multiple_per_line():
    """bfrange bodies are a token stream, not lines: a range broken
    across lines and two ranges on one line must both parse."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"3 beginbfrange\n"
        b"<41>\n<43>\n<0061>\n"                      # split across lines: A-C -> a-c
        b"<50> <51> <0070> <60> <60> [<007A>]\n"     # two ranges on one line
        b"endbfrange\nendcmap\n"
    )
    table, width = _parse_tounicode(cmap)
    assert width == 1
    assert table[0x41] == "a" and table[0x42] == "b" and table[0x43] == "c"
    assert table[0x50] == "p" and table[0x51] == "q"
    assert table[0x60] == "z"


def test_decodeparms_array_form_applies_predictor():
    """/Filter [/FlateDecode] with /DecodeParms [<< /Predictor 12 >>]
    (array form) must apply the PNG predictor — previously silently
    skipped, decoding xref/content streams to garbage."""
    from pdf_extractor_ray.codecs.pdf_codec import StreamObj

    payload = bytes(range(10)) * 2  # two rows of 10 columns
    # PNG Up predictor rows: filter byte 2 + delta vs previous row
    rows, prev = [], bytes(10)
    for i in range(0, 20, 10):
        row = payload[i : i + 10]
        rows.append(bytes([2]) + bytes((row[j] - prev[j]) & 0xFF for j in range(10)))
        prev = row
    compressed = zlib.compress(b"".join(rows))
    obj = StreamObj(
        dict={
            "Filter": ["FlateDecode"],
            "DecodeParms": [{"Predictor": 12, "Columns": 10}],
            "Length": len(compressed),
        },
        raw=compressed,
    )
    resolve = lambda v: v  # noqa: E731 — no indirection in this fixture
    assert obj.data(resolve) == payload


def test_font_cache_key_resolves_indirect_encoding():
    """Two documents with IDENTICAL font dicts referencing /Encoding as
    the same object number but with DIFFERENT /Differences content must
    NOT share a cache entry (round-1 keyed on the raw Ref repr)."""
    from pdf_extractor_ray.codecs.pdf_codec import Ref, _FontDecoder

    class _FakeDoc:
        def __init__(self, enc):
            self._enc = enc

        def resolve(self, v):
            if isinstance(v, Ref):
                return self._enc
            return v

    font = {
        "Type": "Font", "Subtype": "Type1", "BaseFont": "Helvetica",
        "Encoding": Ref(9, 0),
    }
    doc_a = _FakeDoc({"Differences": [65, "bullet"]})
    doc_b = _FakeDoc({"Differences": [65, "degree"]})
    cache = {}
    dec_a = _FontDecoder.__new__(_FontDecoder)
    dec_a.doc, dec_a.cache, dec_a.fonts = doc_a, cache, {}
    dec_b = _FontDecoder.__new__(_FontDecoder)
    dec_b.doc, dec_b.cache, dec_b.fonts = doc_b, cache, {}
    assert dec_a._key_repr(font) != dec_b._key_repr(font)
    fn_a = dec_a._build(font)
    fn_b = dec_b._build(font)
    assert fn_a(b"A") == "•"  # bullet
    assert fn_b(b"A") == "°"  # degree — not the cached bullet decoder
