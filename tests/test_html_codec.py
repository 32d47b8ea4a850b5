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
