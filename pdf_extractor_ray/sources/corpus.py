"""Deterministic Common-Crawl-style pages corpus (input_hint shape).

Synthesises the authoritative input table
``(url, warc_ts, html:binary, text, lang)`` from the driver's
``documents`` table — no external data, fully deterministic per
``doc_id`` (FIXTURES.md F1).  The ``text`` column is the GOLDEN
channel: the expected ``extracted_text`` for the row, computed at
generation time because we author every payload (F1a/F1b).

Mix per doc_id (fixed rules, seed-free determinism):
- ``doc_id % 101`` picks edge rows: empty payload (13), garbage bytes
  (29), truncated PDF (47), boilerplate-only HTML (61), image-only
  scanned PDF (83)
- else ``doc_id % 10 == 7`` → PDF (variant by ``doc_id % 4``: single
  column / two-column / ruled construction table / TJ+leading ops)
- else → HTML (every 5th carries a construction ``<table>``)
- ``doc_id % 97 == 0`` → giant document (content ×30): the skew case
  the pipeline must defuse by repartitioning

Runs as a ``map_batches`` stage so corpus generation itself streams
and scales with the cluster.
"""
from __future__ import annotations

import datetime as _dt
from typing import List, Optional, Tuple

import pyarrow as pa

from ..fixtures.pdf_build import (
    PdfPage,
    build_pdf,
    simple_text_pdf,
    table_pdf,
    two_column_pdf,
)

_EPOCH = _dt.datetime(2025, 1, 1)

# construction vocabulary for item-bearing rows (drives the items pipeline)
_FIXTURES = ("VALVE PACKAGE", "EYE WASH STATION", "BOILER CIRCULATING PUMP",
             "PIPE FITTING", "COOLING TOWER", "WASH STATION", "PUMP ASSEMBLY")
_MODELS = ("OM-141", "MAU-11", "VP-100", "K-2005", "HUH-13", "CH-30")
_DIMS = ('12"', '3/4" x 6', '1 1/2"ø', "25' -1 5/8\"", '2 x 4 x 6')
_MOUNTS = ("wall-mounted", "floor-mounted", "ceiling-hung", "recessed")
_SPECS = ("ASTM D2665", "ANSI A112", "grade A", "31.1", "NFPA 13")

_TABLE_HEADER = ("Item", "Qty", "Model", "Size", "Mounting", "Spec")


def _words(text: str) -> List[str]:
    return text.split() or ["empty", "document", "placeholder", "words"]


def _paragraphs(words: List[str], size: int = 14) -> List[str]:
    """Chunk words into >=10-word paragraphs (codec MIN_CONTENT_WORDS)."""
    out = []
    for i in range(0, len(words), size):
        chunk = words[i : i + size]
        if len(chunk) < 10:  # fold the short tail into the previous para
            if out:
                out[-1] = out[-1] + " " + " ".join(chunk)
            else:
                out.append(" ".join((chunk * 4)[:10]))
        else:
            out.append(" ".join(chunk))
    return out


def _construction_rows(doc_id: int, n: int = 3) -> List[Tuple[str, ...]]:
    rows = []
    for r in range(n):
        k = doc_id + r
        rows.append(
            (
                _FIXTURES[k % len(_FIXTURES)],
                str((k % 9) + 1),
                _MODELS[k % len(_MODELS)],
                _DIMS[k % len(_DIMS)],
                _MOUNTS[k % len(_MOUNTS)],
                _SPECS[k % len(_SPECS)],
            )
        )
    return rows


# ------------------------------------------------------------------- HTML
def _html_doc(doc_id: int, text: str, giant: bool,
              lang: str = "en") -> Tuple[bytes, str]:
    words = _words(text)
    title = f"Document {doc_id}: " + " ".join(words[:3])
    paras = _paragraphs(words)
    if giant:
        paras = paras * 30
    with_table = doc_id % 5 == 0
    rows = _construction_rows(doc_id) if with_table else []

    # deterministic head metadata (page_meta golden channel; the head
    # subtree is ignored by the text codec so extraction goldens are
    # unaffected)
    desc = " ".join(words[:8])
    canonical = f"https://example.org/{doc_id:09d}"
    parts = [
        f'<html lang="{lang}"><head><title>{title}</title>'
        f'<meta name="description" content="{desc}">'
        f'<link rel="canonical" href="{canonical}">'
        f'<meta property="og:title" content="{title}">'
        + ('<meta name="robots" content="noindex, nofollow">'
           if doc_id % 13 == 5 else "")
        + "<style>p{margin:0}</style></head><body>",
        '<nav><a href="/">Home</a> <a href="/about">About</a> '
        '<a href="/contact">Contact</a> <a href="/login">Login</a></nav>',
        # deterministic cross-links: make the link graph non-degenerate
        # (anchor-text index / PageRank channel); <nav> is boilerplate,
        # so extraction goldens are unaffected
        "<nav class=\"related\">"
        + " ".join(
            f'<a href="/p/{(doc_id * 31 + 7 * k) % 1000}">'
            f"Doc {(doc_id * 31 + 7 * k) % 1000}</a>"
            for k in (1, 2, 3)
        )
        + "</nav>",
        f"<h1>{title}</h1>",
    ]
    if doc_id % 7 == 3:  # entity-bearing rows for the entities pipeline
        paras.append(
            f"For ordering contact sales{doc_id}@example.com or call "
            f"555-{doc_id % 900 + 100}-{doc_id % 9000 + 1000} before "
            f"{doc_id % 12 + 1}/{doc_id % 28 + 1}/2025 to lock the quoted "
            f"price of ${doc_id % 90 + 10},500.00 for this order"
        )
    parts += [f"<p>{p}</p>" for p in paras]
    charref = doc_id % 41 == 15
    if charref:
        # character-reference transport: entities in the payload,
        # decoded text in the golden (real parsers decode charrefs)
        parts.append(
            "<p>Entities &amp; escapes &lt;tag&gt; caf&#233; "
            "&quot;quoted&quot; are decoded by real parsers</p>"
        )
    if rows:
        parts.append("<table><tr>" + "".join(f"<th>{h}</th>" for h in _TABLE_HEADER) + "</tr>")
        for row in rows:
            parts.append("<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>")
        parts.append("</table>")
    parts.append(
        '<aside><a href="/ad1">Sponsored one</a> <a href="/ad2">Sponsored two</a></aside>'
    )
    parts.append("<footer>Copyright 2025 Example Corp. ALL RIGHTS RESERVED.</footer>")
    parts.append("</body></html>")

    golden_blocks = [title] + paras
    if charref:
        golden_blocks.append(
            'Entities & escapes <tag> café "quoted" '
            "are decoded by real parsers"
        )
    if rows:
        golden_blocks.append(" | ".join(_TABLE_HEADER))
        golden_blocks += [" | ".join(r) for r in rows]
    doc = "\n".join(parts)
    golden = "\n\n".join(golden_blocks)
    # charset transport variation (deterministic): the codec's sniff
    # order is BOM → declared <meta charset> → UTF-8 → latin-1; plant
    # every path with IDENTICAL decoded content so extraction goldens
    # and all oracles hold unchanged
    sel = doc_id % 37
    if sel == 21:
        doc = doc.replace(
            "<head>", '<head><meta charset="iso-8859-1">', 1)
        return doc.encode("latin-1"), golden
    if sel == 30:
        return "\ufeff".encode("utf-16-le") + doc.encode("utf-16-le"), golden
    if sel == 9:
        return b"\xef\xbb\xbf" + doc.encode("utf-8"), golden
    return doc.encode("utf-8"), golden


# -------------------------------------------------------------------- PDF
def _pdf_doc(doc_id: int, text: str, giant: bool) -> Tuple[bytes, str]:
    words = [w for w in _words(text) if w.isascii()]
    # deterministic Info dict — SQL-reconstructible from (doc_id, text),
    # mirroring the HTML head-metadata rules so pdf_meta gets an oracle
    info = {
        "Title": f"Document {doc_id}: " + " ".join(words[:3]),
        "Author": f"Author {doc_id % 50}",
        "Subject": " ".join(words[:8]),
        "Producer": "pdfx-ray 1.0",
    }
    # RC4-128-encrypted transport for a deterministic classic-PDF
    # subset: SAME logical content (text, Info), so every byte-identity
    # oracle applies unchanged — the codec must decrypt transparently
    enc = "aes" if doc_id % 59 == 41 else (doc_id % 23 == 9)
    # stream-filter transport variation for classic PDFs — every
    # filter the codec supports appears in the driver-checked path,
    # again with unchanged logical content
    filt = {5: "lzw", 12: "a85+flate", 20: "rle", 26: "ahx"}.get(
        doc_id % 31, "flate")
    # the same deterministic cross-links the HTML channel plants (PDFs
    # carry real hyperlinks via /Annots URI actions; the link graph
    # covers BOTH channels)
    links = [
        f"https://example.org/p/{(doc_id * 31 + 7 * k) % 1000}"
        for k in (1, 2, 3)
    ]
    if doc_id % 40 == 17 and not giant:
        # modern PDF ≥1.5: xref stream + object stream container
        from ..fixtures.pdf_build import modern_text_pdf

        lines = [" ".join(words[i : i + 5]) or words[0] for i in range(0, 15, 5)]
        return (
            modern_text_pdf(lines, predictor=doc_id % 80 == 17, info=info,
                            links=links),
            "\n".join(lines),
        )
    variant = (doc_id // 10) % 4
    if variant == 0 or giant:  # single column, multi page
        n_pages = 30 if giant else 1 + doc_id % 3
        lines_per_page = 8
        page_lines: List[List[str]] = []
        k = 0
        for _ in range(n_pages):
            lines = []
            for _ in range(lines_per_page):
                lines.append(" ".join(words[k % len(words) : k % len(words) + 6]) or words[0])
                k += 6
            page_lines.append(lines)
        # deterministic document outline: one bookmark per page —
        # SQL-reconstructible (the table-of-contents channel)
        outline = [f"Section {p + 1} of {n_pages}" for p in range(n_pages)]
        payload = simple_text_pdf(page_lines, info=info, encrypt=enc,
                                  stream_filter=filt, links=links,
                                  outline=outline)
        golden = "\n\n".join("\n".join(ls) for ls in page_lines)
    elif variant == 1:  # two columns
        left = [" ".join(words[i : i + 4]) or words[0] for i in range(0, 16, 4)]
        right = [" ".join(words[i : i + 4]) or words[0] for i in range(16, 32, 4)]
        right = [r or words[0] for r in right]
        payload = two_column_pdf(left, right, info=info, encrypt=enc,
                                 stream_filter=filt, links=links)
        golden = "\n".join(left + right)
    elif variant == 2:  # ruled construction table + prose
        prefix = ["FIXTURE SCHEDULE " + " ".join(words[:3])]
        rows = [_TABLE_HEADER] + _construction_rows(doc_id)
        payload = table_pdf(rows, prefix_lines=prefix, info=info, encrypt=enc,
                            stream_filter=filt, links=links)
        golden = "\n".join(prefix + [" | ".join(r) for r in rows])
    else:  # TJ arrays + leading operators
        lines = [" ".join(words[i : i + 5]) or words[0] for i in range(0, 20, 5)]
        payload = simple_text_pdf(
            [lines], use_tj=doc_id % 2 == 0, use_leading=doc_id % 2 == 1,
            info=info, encrypt=enc, stream_filter=filt, links=links,
        )
        golden = "\n".join(lines)
    return payload, golden


# ------------------------------------------------------------------ stage
class PageSynthesizer:
    """``map_batches`` callable: documents batch → pages batch.

    ``replicate`` multiplies each document into that many distinct
    pages (distinct urls) to scale corpus volume without new inputs.
    """

    def __init__(self, replicate: int = 1) -> None:
        self.replicate = replicate

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls: List[str] = []
        ts: List[_dt.datetime] = []
        payloads: List[Optional[bytes]] = []
        goldens: List[str] = []
        langs: List[str] = []
        statuses: List[str] = []
        kinds: List[str] = []

        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        doc_langs = batch.column("lang").to_pylist()

        for doc_id, text, lang in zip(doc_ids, texts, doc_langs):
            for rep in range(self.replicate):
                vid = doc_id * self.replicate + rep
                giant = vid % 97 == 0
                edge = vid % 101
                if edge == 13:  # empty payload
                    payload, golden, status, kind = b"", "", "empty", "unknown"
                elif edge == 29:  # neither HTML nor PDF
                    payload, golden, status, kind = (
                        b"\x00\xffnot-a-document\x01",
                        "",
                        "empty",
                        "html",  # sniffed as html (no %PDF magic), parses to nothing
                    )
                elif edge == 47:  # truncated PDF (hits the scan fallback, then dies)
                    whole, _ = _pdf_doc(vid, text, giant=False)
                    payload, golden, status, kind = whole[:60], "", "parse_error", "pdf"
                elif edge == 83:  # scanned page: image XObject, no text ops
                    from ..fixtures.pdf_build import image_only_pdf

                    payload, golden, status, kind = (
                        image_only_pdf(), "", "image_only", "pdf",
                    )
                elif edge == 61:  # boilerplate-only HTML
                    payload = (
                        b"<html><body><nav><a href='/'>Home</a> <a href='/a'>About</a>"
                        b"</nav><footer>ALL RIGHTS RESERVED</footer></body></html>"
                    )
                    golden, status, kind = "", "empty", "html"
                elif vid % 10 == 7:
                    payload, golden = _pdf_doc(vid, text, giant)
                    status, kind = "ok", "pdf"
                else:
                    payload, golden = _html_doc(vid, text, giant, lang=lang)
                    status, kind = "ok", "html"
                if status == "ok" and vid % 53 == 31:
                    # gzip Content-Encoding transport (real crawl
                    # bodies); decompressed transparently at sniff, so
                    # every oracle holds unchanged
                    import gzip as _gz

                    payload = _gz.compress(payload, mtime=0)
                urls.append(f"https://example.org/{vid % 1000:04d}/{vid:09d}")
                ts.append(_EPOCH + _dt.timedelta(seconds=vid))
                payloads.append(payload)
                goldens.append(golden)
                langs.append(lang)
                statuses.append(status)
                kinds.append(kind)

        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(payloads, pa.large_binary()),
                "text": pa.array(goldens, pa.large_string()),
                "lang": pa.array(langs, pa.string()),
                # golden metadata (dropped for the pure input view)
                "expected_status": pa.array(statuses, pa.string()),
                "expected_kind": pa.array(kinds, pa.string()),
            }
        )


def pages_dataset(sf_dir: str, replicate: int = 1, concurrency: Optional[int] = None):
    """documents.parquet → streaming pages Dataset (lazy)."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return ds.map_batches(
        PageSynthesizer(replicate=replicate),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def synthesize_pages(sf_dir: str, out_dir: str, replicate: int = 1) -> str:
    """Materialize the pages corpus to parquet once; reused by bench/tests."""
    import os

    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    ds = pages_dataset(sf_dir, replicate=replicate)
    ds.write_parquet(out_dir)
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("ok\n")
    return out_dir
