"""From-scratch WARC source: .warc / .warc.gz crawl archives → pages.

Common Crawl's native container (ISO 28500): a WARC file is a
concatenation of records, each

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...
    \\r\\n
    <Content-Length bytes of block>\\r\\n\\r\\n

``response`` records carry an HTTP response (status line + headers +
body) as their block; the page payload is the HTTP body. `.warc.gz`
files are per-record gzip members, so records can be split without
decompressing the whole file (that member framing is WHY Common Crawl
shards scale — a reader can seek).

Parallelism shape: one task per WARC file via
``ray.data.read_binary_files`` (crawl shards are ~1 GB each, thousands
per crawl — file-level parallelism saturates any cluster); the record
scan inside a task is sequential streaming. Stdlib-only (zlib), no
warcio dependency.

Output rows use the canonical pages schema ``(url, warc_ts,
html:binary, text:null, lang:null)``; non-response records
(warcinfo/request/metadata) are skipped, exactly the records a
boilerplate pipeline consumes.
"""
from __future__ import annotations

import datetime as _dt
import zlib
from typing import Iterator, List, Optional, Tuple

import pyarrow as pa

_CRLF = b"\r\n"


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress each gzip member of a multi-member stream."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        out = d.decompress(data[pos:])
        yield out + d.flush()
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed


def _parse_headers(block: bytes) -> Tuple[dict, int]:
    """Parse CRLF header lines; returns ({lower_name: value}, body_offset)."""
    end = block.find(_CRLF + _CRLF)
    if end < 0:
        return {}, len(block)
    headers: dict = {}
    for line in block[:end].split(_CRLF):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
    return headers, end + 4


def _iter_warc_records(raw: bytes) -> Iterator[Tuple[dict, bytes]]:
    """Yield (warc_headers, block_bytes) for each record in a
    decompressed WARC stream."""
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and raw[pos : pos + 2] == _CRLF:
            pos += 2
        if not raw[pos : pos + 5] == b"WARC/":
            break  # trailing garbage → stop (degrade-and-continue)
        ver_end = raw.find(_CRLF, pos)
        headers, body_off = _parse_headers(raw[ver_end + 2 :])
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            break
        block_start = ver_end + 2 + body_off
        block = raw[block_start : block_start + length]
        yield headers, block
        pos = block_start + length


def _dechunk(body: bytes) -> bytes:
    """Transfer-Encoding: chunked → raw body (hex size lines + CRLF
    framing; trailers ignored).  Malformed framing returns the bytes
    as-is — degrade, never raise."""
    out = bytearray()
    i = 0
    try:
        while i < len(body):
            j = body.index(b"\r\n", i)
            size = int(body[i:j].split(b";")[0], 16)
            if size == 0:
                break
            out += body[j + 2 : j + 2 + size]
            i = j + 2 + size + 2  # skip chunk CRLF
        return bytes(out)
    except (ValueError, IndexError):
        return body


def _http_body(block: bytes) -> bytes:
    """HTTP response block → body (headers stripped, chunked
    transfer-encoding decoded, gzip Content-Encoding left to the
    pipeline's transparent gunzip); tolerates a bare payload with no
    status line."""
    if block[:5] in (b"HTTP/",):
        headers, off = _parse_headers(block)
        body = block[off:]
        if "chunked" in headers.get("transfer-encoding", "").lower():
            body = _dechunk(body)
        return body
    return block


def _http_status(block: bytes) -> int:
    """HTTP status code of a response block (200 when the payload is
    bare / the status line is malformed — permissive like browsers)."""
    if block[:5] == b"HTTP/":
        parts = block.split(b"\r\n", 1)[0].split()
        if len(parts) >= 2 and parts[1].isdigit():
            return int(parts[1])
    return 200


def parse_warc_bytes(data: bytes, is_gzip: Optional[bool] = None,
                     record_type: str = "response") -> List[dict]:
    """One WARC file's bytes → list of page dicts (pure function).
    ``record_type='response'`` strips the HTTP envelope;
    ``'conversion'`` (WET-style extracted text) takes the body raw."""
    if is_gzip is None:
        is_gzip = data[:2] == b"\x1f\x8b"
    if is_gzip:
        raw = b"".join(_split_gzip_members(data))
    else:
        raw = data
    pages = []
    for headers, block in _iter_warc_records(raw):
        if headers.get("warc-type") != record_type:
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "")
        try:
            ts = _dt.datetime.fromisoformat(ts_raw.replace("Z", "+00:00")).replace(
                tzinfo=None
            )
        except ValueError:
            ts = _dt.datetime(1970, 1, 1)
        body = _http_body(block) if record_type == "response" else block
        status = _http_status(block) if record_type == "response" else 200
        pages.append({"url": url, "warc_ts": ts, "html": body,
                      "http_status": status})
    return pages


def pages_from_warc(paths, ok_only: bool = True) -> "ray.data.Dataset":  # noqa: F821
    """WARC file paths/dirs → pages Dataset (canonical input schema).
    ``ok_only`` drops non-2xx responses (error pages / redirects are
    crawl noise a training pipeline excludes); pass False to keep
    everything."""
    import ray.data

    ds = ray.data.read_binary_files(
        list(paths), include_paths=True, file_extensions=["warc", "gz"]
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        urls: List[str] = []
        ts: List[_dt.datetime] = []
        payloads: List[bytes] = []
        for blob in batch.column("bytes").to_pylist():
            for page in parse_warc_bytes(blob):
                if ok_only and not (200 <= page["http_status"] < 300):
                    continue
                urls.append(page["url"])
                ts.append(page["warc_ts"])
                payloads.append(page["html"])
        n = len(urls)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(payloads, pa.large_binary()),
                "text": pa.nulls(n, pa.large_string()),
                "lang": pa.nulls(n, pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


# ------------------------------------------------------------ test writer
def build_warc(records: List[Tuple[str, str, bytes]], gzip_members: bool = False) -> bytes:
    """Author a WARC file (url, iso_ts, payload) — fixtures own both
    sides of the codec, same philosophy as fixtures/pdf_build.py."""
    import gzip as _gzip

    out = []
    for url, iso_ts, payload in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {iso_ts}\r\n"
            f"Content-Length: {len(http)}\r\n"
            f"\r\n"
        ).encode()
        rec = head + http + _CRLF + _CRLF
        out.append(_gzip.compress(rec) if gzip_members else rec)
    return b"".join(out)


# ------------------------------------------------------------- WET sink
def wet_bytes(records: "List[Tuple[str, str, str]]") -> bytes:
    """(url, iso_ts, extracted_text) rows → WET-style WARC bytes:
    one gzip member per ``conversion`` record (the Common-Crawl WET
    convention, so any member boundary is a valid resume point)."""
    import gzip as _gzip

    out = []
    for url, iso_ts, text in records:
        body = (text or "").encode("utf-8")
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {iso_ts}\r\n"
            f"Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n"
            f"\r\n"
        ).encode()
        out.append(_gzip.compress(head + body + _CRLF + _CRLF, mtime=0))
    return b"".join(out)


def write_wet(ds, out_dir: str, text_col: str = "extracted_text"):
    """Extraction Dataset → partitioned ``.warc.gz`` WET shards, one
    file per block, named by the CONTENT hash of the member urls (a
    re-run over identical input rewrites the identical file set — the
    idempotent-resume property `state/manifest.py` relies on; no task
    indices or timestamps in names).  Returns the written manifest as
    a Dataset ``(path, n_records, n_bytes)`` — consume it to force the
    write, exactly like ``Dataset.write_parquet`` semantics."""
    import hashlib
    import os

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        urls = batch.column("url").to_pylist()
        ts = (batch.column("warc_ts").to_pylist()
              if "warc_ts" in batch.column_names else [None] * len(urls))
        texts = batch.column(text_col).to_pylist()
        recs = [
            (u, (t.isoformat() + "Z") if t is not None else "1970-01-01T00:00:00Z",
             x or "")
            for u, t, x in zip(urls, ts, texts)
        ]
        payload = wet_bytes(recs)
        digest = hashlib.md5("\n".join(urls).encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"wet-{digest}-{len(urls)}.warc.gz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)  # atomic publish (resume-safe)
        return pa.table({
            "path": pa.array([path], pa.string()),
            "n_records": pa.array([len(urls)], pa.int64()),
            "n_bytes": pa.array([len(payload)], pa.int64()),
        })

    return ds.map_batches(write_block, batch_format="pyarrow")


def texts_from_wet(paths) -> "ray.data.Dataset":  # noqa: F821
    """WET shard paths/dirs → (url, warc_ts, text) Dataset."""
    import ray.data

    ds = ray.data.read_binary_files(
        list(paths), include_paths=True, file_extensions=["warc", "gz"]
    )

    def to_texts(batch: pa.Table) -> pa.Table:
        urls: List[str] = []
        ts: List[_dt.datetime] = []
        texts: List[str] = []
        for blob in batch.column("bytes").to_pylist():
            for rec in parse_warc_bytes(blob, record_type="conversion"):
                urls.append(rec["url"])
                ts.append(rec["warc_ts"])
                texts.append(rec["html"].decode("utf-8", "replace"))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "text": pa.array(texts, pa.large_string()),
            }
        )

    return ds.map_batches(to_texts, batch_format="pyarrow")
