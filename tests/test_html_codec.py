"""Golden unit tests for the HTML boilerplate-stripping codec (no Ray)."""
from __future__ import annotations

from pdf_extractor_ray.codecs.html_codec import HtmlCodec

codec = HtmlCodec()

PAGE = b"""<html><head><title>T</title><style>p{}</style></head><body>
<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
<h1>Main Headline</h1>
<p>This is the first real paragraph of the article with enough words to count as content.</p>
<p>And here is a second substantial paragraph that also carries the main message of the page.</p>
<aside><a href="/x">Ad one</a> <a href="/y">Ad two</a></aside>
<footer>Copyright 2025. ALL RIGHTS RESERVED.</footer>
</body></html>"""


def test_strips_nav_aside_footer():
    r = codec.extract(PAGE)
    assert r.status == "ok"
    assert "Home" not in r.text
    assert "Ad one" not in r.text
    assert "ALL RIGHTS RESERVED" not in r.text
    assert "Main Headline" in r.text
    assert "first real paragraph" in r.text


def test_blocks_joined_with_double_newline_and_spans():
    r = codec.extract(PAGE)
    parts = r.text.split("\n\n")
    assert parts[0] == "Main Headline"
    raw = r.text.encode("utf-8")
    for (_bid, start, stop, kind) in r.spans:
        assert 0 <= start < stop <= len(raw)
    texts = [raw[s:e].decode() for (_b, s, e, _k) in r.spans]
    assert texts == parts


def test_link_density_boilerplate():
    page = (
        b"<html><body><div><a href='/1'>one</a> <a href='/2'>two</a> <a href='/3'>three</a></div>"
        b"<p>A genuinely long content paragraph with many plain words and no links at all inside.</p>"
        b"</body></html>"
    )
    r = codec.extract(page)
    assert "one" not in r.text
    assert "genuinely long content paragraph" in r.text


def test_table_rows_kept():
    page = (
        b"<html><body>"
        b"<p>Intro paragraph that is long enough to be treated as real page content here.</p>"
        b"<table><tr><th>Item</th><th>Qty</th></tr><tr><td>VALVE</td><td>2</td></tr></table>"
        b"</body></html>"
    )
    r = codec.extract(page)
    assert "Item | Qty" in r.text
    assert "VALVE | 2" in r.text


def test_short_block_promotion():
    page = (
        b"<html><body>"
        b"<p>First long paragraph with plenty of words to qualify as main page content here.</p>"
        b"<p>Short bridge text.</p>"
        b"<p>Second long paragraph with plenty of words to qualify as main page content too.</p>"
        b"</body></html>"
    )
    r = codec.extract(page)
    assert "Short bridge text." in r.text


def test_empty_and_boiler_only():
    assert codec.extract(b"").status == "empty"
    only_boiler = b"<html><body><nav><a href='/'>Home</a></nav></body></html>"
    assert codec.extract(only_boiler).status == "empty"


def test_no_body_still_extracts():
    page = b"<html><p>Paragraph without body tag but with enough words to be counted as content.</p></html>"
    r = codec.extract(page)
    assert "without body tag" in r.text


def test_utf8_and_bad_bytes():
    page = "<html><body><p>Unicode café ø dimension paragraph with enough words to count as content.</p></body></html>".encode()
    r = codec.extract(page)
    assert "café ø" in r.text
    r2 = codec.extract(b"\xff\xfe<html><body><p>" + b"words " * 12 + b"</p></body></html>")
    assert r2.status in ("ok", "empty")


def test_deterministic():
    assert codec.extract(PAGE).text == codec.extract(PAGE).text


def test_charset_detection():
    """Crawled-page charset sniff: meta charset, BOM, latin-1 fallback."""
    from pdf_extractor_ray.codecs.html_codec import HtmlCodec

    codec = HtmlCodec()
    body = "café au lait servi très chaud avec beaucoup de mots pour le score"
    # declared latin-1
    p1 = (f'<html><head><meta charset="iso-8859-1"></head>'
          f"<body><p>{body}</p></body></html>").encode("latin-1")
    assert "café" in codec.extract(p1).text
    # declared via http-equiv content=
    p2 = (f'<html><head><meta http-equiv="Content-Type" '
          f'content="text/html; charset=windows-1252"></head>'
          f"<body><p>{body}</p></body></html>").encode("cp1252")
    assert "très" in codec.extract(p2).text
    # UTF-8 BOM
    p3 = b"\xef\xbb\xbf" + (f"<html><body><p>{body}</p></body></html>").encode("utf-8")
    assert "café" in codec.extract(p3).text
    # undeclared non-UTF8: latin-1 fallback, never raises
    p4 = (f"<html><body><p>{body}</p></body></html>").encode("latin-1")
    r = codec.extract(p4)
    assert r.status == "ok" and "caf" in r.text


def test_extract_meta_full_head():
    from pdf_extractor_ray.codecs.html_codec import extract_meta

    m = extract_meta(
        '<html lang="EN-us"><head><title> My  Page \n Title </title>'
        '<meta name="description" content="a short summary">'
        '<link rel="canonical" href="https://ex.org/x">'
        '<meta property="og:title" content="OG Title">'
        "</head><body><p>body text</p></body></html>"
    )
    assert m["title"] == "My Page Title"          # whitespace-normalized
    assert m["description"] == "a short summary"
    assert m["canonical_url"] == "https://ex.org/x"
    assert m["html_lang"] == "en-us"              # lowercased
    assert m["og_title"] == "OG Title"


def test_extract_meta_first_wins_and_head_scope():
    from pdf_extractor_ray.codecs.html_codec import extract_meta

    m = extract_meta(
        "<html><head><title>first</title>"
        '<meta name="description" content="first desc">'
        '<meta name="description" content="second desc">'
        "</head><body><title>body title</title>"
        '<link rel="canonical" href="https://late.example/">'
        "</body></html>"
    )
    assert m["title"] == "first"
    assert m["description"] == "first desc"
    assert m["canonical_url"] is None  # body metadata ignored after </head>


def test_extract_meta_malformed_never_raises():
    from pdf_extractor_ray.codecs.html_codec import extract_meta

    for payload in (
        b"",
        b"\x00\xffnot-a-document\x01",
        b"<html><head><title>unclosed",
        "<head><meta name=description content></head>",
        b"<html><body>no head at all</body></html>",
    ):
        m = extract_meta(payload)
        assert set(m) == {
            "title", "description", "canonical_url", "html_lang",
            "og_title", "robots",
        }


def test_extract_meta_charset_bytes():
    from pdf_extractor_ray.codecs.html_codec import extract_meta

    p = ('<html><head><meta charset="iso-8859-1">'
         "<title>café menu</title></head><body></body></html>"
         ).encode("latin-1")
    assert extract_meta(p)["title"] == "café menu"


def test_page_meta_stage_batch():
    import pyarrow as pa
    from pdf_extractor_ray.stages.extract import PageMetaStage

    batch = pa.table(
        {
            "url": pa.array(["u1", "u2", "u3"]),
            "html": pa.array(
                [
                    b'<html lang="fr"><head><title>T1</title>'
                    b'<link rel="canonical" href="https://c/1"></head>'
                    b"<body></body></html>",
                    b"<html><body>headless</body></html>",
                    None,
                ],
                pa.large_binary(),
            ),
        }
    )
    out = PageMetaStage()(batch)
    assert out.column_names == [
        "url", "title", "description", "canonical_url", "html_lang",
        "og_title", "robots",
    ]
    assert out.column("title").to_pylist() == ["T1", None, None]
    assert out.column("canonical_url").to_pylist() == ["https://c/1", None, None]
    assert out.column("html_lang").to_pylist() == ["fr", None, None]


def test_structure_stats_counts_and_depth():
    from pdf_extractor_ray.codecs.html_codec import structure_stats

    s = structure_stats(
        "<html><head><meta charset='utf-8'><title>t</title></head>"
        "<body><nav><a href='/'>H</a><a href='/b'>B</a></nav>"
        "<p>one</p><p>two</p>"
        "<table><tr><th>h</th></tr><tr><td>1</td><td>2</td></tr></table>"
        "</body></html>"
    )
    assert s == {"n_p": 2, "n_a": 2, "n_table": 1, "n_tr": 2,
                 "n_th": 1, "n_td": 2, "max_depth": 5}


def test_structure_stats_malformed_and_void():
    from pdf_extractor_ray.codecs.html_codec import structure_stats

    # unclosed tags never underflow/raise; void tags don't add depth
    s = structure_stats(b"<html><body><p>unclosed<br><img src=x>")
    assert s["n_p"] == 1 and s["max_depth"] == 3
    assert structure_stats(b"\x01\x02 no tags")["max_depth"] == 0


def test_page_structure_stage_batch():
    import pyarrow as pa
    from pdf_extractor_ray.stages.extract import PageStructureStage

    batch = pa.table({
        "url": pa.array(["u1", "u2"]),
        "html": pa.array(
            [b"<html><body><p>x</p></body></html>", None], pa.large_binary()
        ),
    })
    out = PageStructureStage()(batch)
    assert out.column("n_p").to_pylist() == [1, 0]
    assert out.column("max_depth").to_pylist() == [3, 0]


def test_extract_meta_robots_directive():
    from pdf_extractor_ray.codecs.html_codec import extract_meta

    m = extract_meta(
        b"<html><head><title>t</title>"
        b'<meta name="ROBOTS" content="NOINDEX, NOFOLLOW">'
        b"</head><body><p>x</p></body></html>"
    )
    assert m["robots"] == "noindex, nofollow"
    assert extract_meta(b"<html><head></head><body></body></html>")["robots"] is None
    # body-scope meta is ignored (first-wins head-only policy)
    m2 = extract_meta(
        b"<html><head></head><body>"
        b'<meta name="robots" content="noindex"></body></html>'
    )
    assert m2["robots"] is None


def test_corpus_charset_variants_decode_identically():
    """doc_id % 37 routes HTML payloads over every charset-sniff path
    (meta-declared latin-1, UTF-16LE BOM, UTF-8 BOM, plain UTF-8) with
    identical decoded content — goldens and oracles hold unchanged."""
    from pdf_extractor_ray.codecs.html_codec import HtmlCodec, extract_meta
    from pdf_extractor_ray.sources.corpus import _html_doc

    text = " ".join(f"w{i}" for i in range(40))
    markers = {}
    for did, expect in ((58, b"iso-8859-1"), (104, b"\xff\xfe"),
                        (46, b"\xef\xbb\xbf"), (20, b"<html")):
        payload, golden = _html_doc(did, text, False)
        if did == 104:
            assert payload[:2] == b"\xff\xfe"
        else:
            assert expect in payload[:64]
        r = HtmlCodec().extract(payload)
        assert r.text == golden, did
        assert extract_meta(payload)["canonical_url"], did
        markers[did] = True
    # latin-1 page carrying the non-ASCII ø table dimension
    payload, golden = _html_doc(95, text, False)
    assert b"\xf8" in payload
    assert HtmlCodec().extract(payload).text == golden
