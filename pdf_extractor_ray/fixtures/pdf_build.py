"""Hand-authored minimal PDF 1.4 writer for fixtures.

We author content streams byte-by-byte so golden text is known at
generation time (SURVEY.md §5.2 / FIXTURES.md F1b).  Feature surface is
deliberately small and fully controlled: catalog/pages/page objects,
one Flate-compressed content stream per page, Helvetica (simple Type1
font, standard widths), text operators ``BT ET Tf Td TD TL T* Tm Tj TJ``
and path operators ``m l re S`` for ruled tables.

This module exists only to BUILD test inputs; the from-scratch parser
lives in ``codecs/pdf_codec.py``.
"""
from __future__ import annotations

import hashlib
import zlib
from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

from ..codecs.aes import aes128_cbc_encrypt
from ..codecs.pdf_codec import _PAD, _rc4


@dataclass
class PdfPage:
    width: float = 612.0
    height: float = 792.0
    # text chunks: (x, y, font_size, text)
    texts: List[Tuple[float, float, float, str]] = field(default_factory=list)
    # ruled line segments for tables: (x1, y1, x2, y2)
    rules: List[Tuple[float, float, float, float]] = field(default_factory=list)
    use_tj_array: bool = False  # exercise the TJ operator path
    use_leading: bool = False  # exercise TL / T* line advances
    # URI link annotations (/Annots with /A /S /URI actions)
    links: List[str] = field(default_factory=list)


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _fmt(v: float) -> str:
    return f"{v:.2f}".rstrip("0").rstrip(".")


def _content_stream(page: PdfPage) -> bytes:
    ops: List[str] = []
    for x1, y1, x2, y2 in page.rules:
        ops.append(f"{_fmt(x1)} {_fmt(y1)} m {_fmt(x2)} {_fmt(y2)} l S")
    if page.use_leading and page.texts:
        # one BT block: first Td positions, T* advances by leading
        x0, y0, size, _ = page.texts[0]
        leading = 0.0
        if len(page.texts) > 1:
            leading = page.texts[0][1] - page.texts[1][1]
        ops.append("BT")
        ops.append(f"/F1 {_fmt(size)} Tf")
        ops.append(f"{_fmt(leading)} TL")
        ops.append(f"{_fmt(x0)} {_fmt(y0)} Td")
        for i, (x, y, sz, text) in enumerate(page.texts):
            if i:
                ops.append("T*")
            ops.append(f"({_esc(text)}) Tj")
        ops.append("ET")
    else:
        for x, y, size, text in page.texts:
            ops.append("BT")
            ops.append(f"/F1 {_fmt(size)} Tf")
            ops.append(f"{_fmt(x)} {_fmt(y)} Td")
            if page.use_tj_array:
                words = text.split(" ")
                parts = []
                for i, w in enumerate(words):
                    if i:
                        parts.append("-278")  # one space advance (thousandths)
                    parts.append(f"({_esc(w)})")
                ops.append(f"[{' '.join(parts)}] TJ")
            else:
                ops.append(f"({_esc(text)}) Tj")
            ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def _info_body(info: dict, cipher=None) -> bytes:
    """Serialize a document-information dictionary (/Title /Author ...):
    literal strings plain, HEX strings when ``cipher`` encrypts values
    (ciphertext bytes are not literal-safe)."""
    parts = [b"<<"]
    for key, val in info.items():
        if cipher is None:
            parts.append(f"/{key} ({_esc(str(val))})".encode("latin-1"))
        else:
            ct = cipher(str(val).encode("latin-1"))
            parts.append(f"/{key} <".encode() + ct.hex().encode() + b">")
    parts.append(b">>")
    return b" ".join(parts)


# ------------------------------------------------------- stream encoders
def _ahx_encode(data: bytes) -> bytes:
    return data.hex().encode("ascii") + b">"


def _a85_encode(data: bytes) -> bytes:
    import base64

    return base64.a85encode(data) + b"~>"


def _rle_encode(data: bytes) -> bytes:
    """PDF RunLengthDecode inverse: literal runs ≤128, repeat runs for
    ≥2 identical bytes, 128 EOD terminator."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 256:
            j += 1
        run = j - i + 1
        if run >= 2:
            out.append(257 - min(run, 128))
            out.append(data[i])
            i += min(run, 128)
        else:
            k = i
            while (k < n and k - i < 128
                   and not (k + 1 < n and data[k + 1] == data[k])):
                k += 1
            out.append(k - i - 1)
            out += data[i:k]
            i = k
    out.append(128)
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """PDF LZWDecode inverse (TIFF early-change, MSB-first 9-12 bit
    codes) — mirrors the decoder in codecs/pdf_codec.py exactly."""
    out_bits = bytearray()
    acc = 0
    nbits = 0
    width = 9
    table = {bytes([i]): i for i in range(256)}
    next_code = 258

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out_bits.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)  # clear
    prev = b""
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        if next_code < (1 << 12) - 1:
            table[cur] = next_code
            next_code += 1
            # early change, mirrored one step BEHIND the encoder's
            # table: the decoder only creates this entry while
            # processing the NEXT code, so it widens when ITS table
            # (next_code - 1 entries) reaches (1<<width)-1 — i.e. when
            # next_code >= 1<<width
            if next_code >= (1 << width) and width < 12:
                width += 1
        # else: table frozen — every further emit addresses an existing
        # code (< 4095, fits 12 bits); the decoder's extra appends are
        # unreachable and harmless
        prev = bytes([b])
    if prev:
        emit(table[prev])
    emit(257)  # EOD
    if nbits:
        out_bits.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out_bits)


_STREAM_FILTERS = {
    # spec name → (PDF /Filter value, encoder over raw content bytes)
    "flate": ("/FlateDecode", lambda d: zlib.compress(d)),
    "lzw": ("/LZWDecode", _lzw_encode),
    "ahx": ("/ASCIIHexDecode", _ahx_encode),
    "rle": ("/RunLengthDecode", _rle_encode),
    # filter ARRAY: decoder applies A85 then Flate → encode as
    # a85(flate(data))
    "a85+flate": ("[ /ASCII85Decode /FlateDecode ]",
                  lambda d: _a85_encode(zlib.compress(d))),
}


# ------------------------------------------------- standard security (R3)
_FIXTURE_FILE_ID = bytes(range(16))
_FIXTURE_OWNER_PW = b"fixture-owner"
_ENC_P = -44


def _owner_entry(owner_pw: bytes, keylen: int = 16) -> bytes:
    h = hashlib.md5((owner_pw + _PAD)[:32]).digest()
    for _ in range(50):
        h = hashlib.md5(h).digest()
    key = h[:keylen]
    o = _rc4(key, _PAD)  # empty user password -> pad
    for i in range(1, 20):
        o = _rc4(bytes(b ^ i for b in key), o)
    return o


def _file_key(o: bytes, keylen: int = 16) -> bytes:
    h = hashlib.md5()
    h.update(_PAD)
    h.update(o[:32])
    h.update((_ENC_P & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(_FIXTURE_FILE_ID)
    key = h.digest()
    for _ in range(50):
        key = hashlib.md5(key[:keylen]).digest()
    return key[:keylen]


def _obj_key(fkey: bytes, num: int, gen: int = 0, aes: bool = False) -> bytes:
    k = fkey + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    if aes:
        k += b"sAlT"
    return hashlib.md5(k).digest()[:16]


def _encrypt_obj(fkey: bytes, num: int, data: bytes, aes: bool) -> bytes:
    if aes:
        iv = hashlib.md5(b"fixture-iv" + num.to_bytes(3, "little")).digest()
        return aes128_cbc_encrypt(_obj_key(fkey, num, aes=True), iv, data)
    return _rc4(_obj_key(fkey, num), data)


def build_pdf(
    pages: Sequence[PdfPage],
    compress: bool = True,
    truncate_at: int | None = None,
    info: dict | None = None,
    encrypt: "bool | str" = False,
    stream_filter: str = "flate",
    outline: "Sequence[str] | None" = None,
    indirect_info: bool = False,
) -> bytes:
    """Serialize pages into a complete PDF 1.4 file (correct xref).

    ``truncate_at`` chops the output to simulate a corrupt shard
    (FIXTURES.md F1 edge rows).  ``info`` adds a document-information
    dictionary referenced from the trailer ``/Info`` key.  ``encrypt``
    wraps the file in the standard security handler — ``True``/"rc4"
    = V2 R3 RC4-128, ``"aes"`` = V4 R4 /AESV2 (AES-128-CBC) — with
    empty user password: every stream and Info string is encrypted
    with its object key — SAME logical content, so byte-identity
    oracles apply unchanged and the codec must decrypt transparently.
    """
    objects: List[bytes] = []  # 1-indexed object bodies (without "N 0 obj")
    aes = encrypt == "aes"
    fkey = _file_key(_owner_entry(_FIXTURE_OWNER_PW)) if encrypt else None

    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    # link-annotation objects follow the font object, in page order
    annot_base = font_num + 1
    annot_nums: List[List[int]] = []
    next_annot = annot_base
    for page in pages:
        nums = list(range(next_annot, next_annot + len(page.links)))
        annot_nums.append(nums)
        next_annot += len(page.links)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    outline = list(outline or [])
    # objects: 1 catalog, 2 pages, per-page page+content, font,
    # annots…, [outlines root + items], [info], [encrypt]
    if outline:
        # root obj number = after font + all annotations
        outlines_root = annot_base + sum(len(p.links) for p in pages)
        objects.append(
            f"<< /Type /Catalog /Pages 2 0 R /Outlines {outlines_root} 0 R "
            f">>".encode()
        )  # obj 1
    else:
        objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # obj 1
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # obj 2
    for i, page in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        annots = ""
        if annot_nums[i]:
            refs = " ".join(f"{n} 0 R" for n in annot_nums[i])
            annots = f" /Annots [ {refs} ]"
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R "
                f"/MediaBox [0 0 {_fmt(page.width)} {_fmt(page.height)}] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                f"/Contents {content_num} 0 R{annots} >>"
            ).encode()
        )
        data = _content_stream(page)
        if compress:
            fname, enc_fn = _STREAM_FILTERS[stream_filter]
            data = enc_fn(data)
        if fkey is not None:  # this stream will be object len(objects)+1
            data = _encrypt_obj(fkey, len(objects) + 1, data, aes)
        if compress:
            head = f"<< /Length {len(data)} /Filter {fname} >>".encode()
        else:
            head = f"<< /Length {len(data)} >>".encode()
        objects.append(head + b"\nstream\n" + data + b"\nendstream")
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )  # font obj
    _annots_emitted_marker = True
    for i, page in enumerate(pages):
        for k, uri in enumerate(page.links):
            num = len(objects) + 1
            uri_bytes = _esc(uri).encode("latin-1")
            if fkey is not None:
                ct = _encrypt_obj(fkey, num, uri_bytes, aes)
                uri_lit = b"<" + ct.hex().encode() + b">"
            else:
                uri_lit = b"(" + uri_bytes + b")"
            y = 40.0 + 12 * k
            objects.append(
                (
                    f"<< /Type /Annot /Subtype /Link "
                    f"/Rect [72 {_fmt(y)} 200 {_fmt(y + 10)}] "
                    f"/Border [0 0 0] /A << /Type /Action /S /URI /URI "
                ).encode() + uri_lit + b" >> >>"
            )
    if outline:
        root_num = len(objects) + 1
        first_item = root_num + 1
        last_item = root_num + len(outline)
        objects.append(
            (f"<< /Type /Outlines /First {first_item} 0 R "
             f"/Last {last_item} 0 R /Count {len(outline)} >>").encode()
        )
        for j, title in enumerate(outline):
            num = root_num + 1 + j
            t_bytes = _esc(title).encode("latin-1")
            if fkey is not None:
                ct = _encrypt_obj(fkey, num, t_bytes, aes)
                t_lit = b"<" + ct.hex().encode() + b">"
            else:
                t_lit = b"(" + t_bytes + b")"
            parts = [f"<< /Title ".encode() + t_lit
                     + f" /Parent {root_num} 0 R".encode()]
            if j > 0:
                parts.append(f" /Prev {num - 1} 0 R".encode())
            if j < len(outline) - 1:
                parts.append(f" /Next {num + 1} 0 R".encode())
            parts.append(b" /Dest [ 3 0 R /Fit ] >>")
            objects.append(b"".join(parts))
    info_ref = b""
    if info:
        if indirect_info:
            # each Info VALUE is an indirect ref to a string object of
            # its own — strings decrypt with the CONTAINING object's
            # num/gen, so these must use the string object's key, not
            # the Info dict's (PDF 32000-1 §7.6.2)
            refs = {}
            for key, val in info.items():
                num = len(objects) + 1
                s = _esc(str(val)).encode("latin-1")
                if fkey is not None:
                    ct = _encrypt_obj(fkey, num, s, aes)
                    objects.append(b"<" + ct.hex().encode() + b">")
                else:
                    objects.append(b"(" + s + b")")
                refs[key] = num
            body = " ".join(f"/{k} {n} 0 R" for k, n in refs.items())
            objects.append(f"<< {body} >>".encode())
        elif fkey is not None:
            num = len(objects) + 1
            objects.append(_info_body(
                info, cipher=lambda b, n=num: _encrypt_obj(fkey, n, b, aes)
            ))
        else:
            objects.append(_info_body(info))
        info_ref = f" /Info {len(objects)} 0 R".encode()
    enc_ref = b""
    if fkey is not None:
        o_hex = _owner_entry(_FIXTURE_OWNER_PW).hex()
        u_hex = _rc4(fkey, _PAD).hex()
        if aes:
            enc_body = (
                "<< /Filter /Standard /V 4 /R 4 /Length 128 "
                "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                "/StmF /StdCF /StrF /StdCF "
                f"/O <{o_hex}> /U <{u_hex}> /P {_ENC_P} >>"
            )
        else:
            enc_body = (
                "<< /Filter /Standard /V 2 /R 3 /Length 128 "
                f"/O <{o_hex}> /U <{u_hex}> /P {_ENC_P} >>"
            )
        objects.append(enc_body.encode())
        enc_ref = (
            f" /Encrypt {len(objects)} 0 R /ID [<{_FIXTURE_FILE_ID.hex()}> "
            f"<{_FIXTURE_FILE_ID.hex()}>]"
        ).encode()

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    n = len(objects) + 1
    out += f"xref\n0 {n}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n} /Root 1 0 R{info_ref.decode()}"
        f"{enc_ref.decode()} >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    result = bytes(out)
    if truncate_at is not None:
        result = result[:truncate_at]
    return result


def simple_text_pdf(
    page_lines: Sequence[Sequence[str]],
    size: float = 12.0,
    use_tj: bool = False,
    use_leading: bool = False,
    info: dict | None = None,
    encrypt: bool = False,
    stream_filter: str = "flate",
    links: "List[str] | None" = None,
    outline: "Sequence[str] | None" = None,
) -> bytes:
    """One text chunk per line, single column, top-down."""
    pages = []
    for lines in page_lines:
        texts = [
            (72.0, 720.0 - i * (size * 1.4), size, line)
            for i, line in enumerate(lines)
        ]
        pages.append(PdfPage(texts=texts, use_tj_array=use_tj, use_leading=use_leading))
    if pages and links:
        pages[0].links = list(links)
    return build_pdf(pages, info=info, encrypt=encrypt,
                     stream_filter=stream_filter, outline=outline)


def two_column_pdf(left: Sequence[str], right: Sequence[str], size: float = 10.0,
                   info: dict | None = None, encrypt: bool = False,
                   stream_filter: str = "flate",
                   links: "List[str] | None" = None) -> bytes:
    """Two-column page: reading order = all left lines, then all right."""
    texts = []
    for i, line in enumerate(left):
        texts.append((50.0, 720.0 - i * (size * 1.4), size, line))
    for i, line in enumerate(right):
        texts.append((330.0, 720.0 - i * (size * 1.4), size, line))
    return build_pdf([PdfPage(texts=texts, links=list(links or []))],
                     info=info, encrypt=encrypt, stream_filter=stream_filter)


def table_pdf(
    rows: Sequence[Sequence[str]],
    prefix_lines: Sequence[str] = (),
    size: float = 10.0,
    info: dict | None = None,
    encrypt: bool = False,
    stream_filter: str = "flate",
    links: "List[str] | None" = None,
) -> bytes:
    """Page with a ruled table grid (plus optional prose above it)."""
    texts = []
    y = 740.0
    for line in prefix_lines:
        texts.append((72.0, y, size, line))
        y -= size * 1.6
    n_rows = len(rows)
    n_cols = max(len(r) for r in rows)
    x0, row_h, col_w = 72.0, 24.0, 110.0
    top = y - 10.0
    rules: List[Tuple[float, float, float, float]] = []
    for r in range(n_rows + 1):
        yy = top - r * row_h
        rules.append((x0, yy, x0 + n_cols * col_w, yy))
    for c in range(n_cols + 1):
        xx = x0 + c * col_w
        rules.append((xx, top, xx, top - n_rows * row_h))
    for r, row in enumerate(rows):
        cy = top - r * row_h - row_h * 0.7
        for c, cell in enumerate(row):
            if cell:
                texts.append((x0 + c * col_w + 4.0, cy, size, cell))
    return build_pdf([PdfPage(texts=texts, rules=rules,
                              links=list(links or []))], info=info,
                     encrypt=encrypt, stream_filter=stream_filter)


# ---------------------------------------------------------------- PDF ≥1.5
def modern_text_pdf(lines: Sequence[str], predictor: bool = True,
                    info: dict | None = None,
                    links: "List[str] | None" = None) -> bytes:
    """Author a PDF 1.5-style file: catalog/pages/page/font packed in a
    compressed OBJECT STREAM, a CROSS-REFERENCE STREAM (W=[1,4,2],
    optional PNG Up predictor) instead of a classic xref table.

    Exercises the modern-PDF paths real crawl shards hit:
    type-2 xref entries, /ObjStm /N /First headers, /Prev-less single
    xref stream, /DecodeParms predictors.
    """
    # content stream (object 4, classic)
    y = 720.0
    ops = []
    for line in lines:
        ops.append(f"BT\n/F1 10 Tf\n50 {_fmt(y)} Td\n({_esc(line)}) Tj\nET")
        y -= 14.0
    content = zlib.compress(("\n".join(ops) + "\n").encode("latin-1"))

    # object stream (object 6) holding objects 1,2,3,5 (+8 = Info)
    links = list(links or [])
    annot_start = 9 if info else 8
    annots_ref = b""
    if links:
        refs = " ".join(f"{annot_start + k} 0 R" for k in range(len(links)))
        annots_ref = f" /Annots [ {refs} ]".encode()
    members = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R"
            + annots_ref + b" >>"),
        (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    if info:
        members.append((8, _info_body(info)))
    bodies = b""
    header = b""
    for num, body in members:
        header += f"{num} {len(bodies)} ".encode()
        bodies += body + b"\n"
    objstm_plain = header + bodies
    first = len(header)
    objstm = zlib.compress(objstm_plain)

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}

    def emit(num: int, payload: bytes) -> None:
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode() + payload + b"\nendobj\n")

    emit(4, b"<< /Length " + str(len(content)).encode()
         + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream")
    emit(6, b"<< /Type /ObjStm /N " + str(len(members)).encode()
         + b" /First " + str(first).encode()
         + b" /Length " + str(len(objstm)).encode()
         + b" /Filter /FlateDecode >>\nstream\n" + objstm + b"\nendstream")
    for k, uri in enumerate(links):
        emit(annot_start + k,
             (f"<< /Type /Annot /Subtype /Link /Rect [72 {40 + 12 * k} 200 "
              f"{50 + 12 * k}] /Border [0 0 0] /A << /Type /Action /S /URI "
              f"/URI ({_esc(uri)}) >> >>").encode("latin-1"))

    # xref stream (object 7): W = [1, 4, 2]; entries for objects
    # 0..7 (+8 Info) (+annotations)
    n_objs = (9 if info else 8) + len(links)
    xref_pos_placeholder = len(out)  # object 7 starts here
    offsets[7] = xref_pos_placeholder
    rows = []
    rows.append(bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big"))  # 0 free
    for num, (stm, idx) in ((1, (6, 0)), (2, (6, 1)), (3, (6, 2))):
        rows.append(bytes([2]) + stm.to_bytes(4, "big") + idx.to_bytes(2, "big"))
    rows.append(bytes([1]) + offsets[4].to_bytes(4, "big") + (0).to_bytes(2, "big"))
    rows.append(bytes([2]) + (6).to_bytes(4, "big") + (3).to_bytes(2, "big"))  # obj 5
    rows.append(bytes([1]) + offsets[6].to_bytes(4, "big") + (0).to_bytes(2, "big"))
    rows.append(bytes([1]) + offsets[7].to_bytes(4, "big") + (0).to_bytes(2, "big"))
    if info:
        rows.append(bytes([2]) + (6).to_bytes(4, "big") + (4).to_bytes(2, "big"))  # obj 8
    for k in range(len(links)):
        rows.append(bytes([1])
                    + offsets[annot_start + k].to_bytes(4, "big")
                    + (0).to_bytes(2, "big"))
    rec = b"".join(rows)
    parms = b""
    if predictor:
        # PNG Up predictor, columns = 7 bytes per record
        rowlen = 7
        pred_rows = []
        prev = bytes(rowlen)
        for i in range(0, len(rec), rowlen):
            row = rec[i : i + rowlen]
            pred_rows.append(bytes([2]) + bytes((row[j] - prev[j]) & 0xFF for j in range(rowlen)))
            prev = row
        rec = b"".join(pred_rows)
        parms = b" /DecodeParms << /Predictor 12 /Columns 7 >>"
    xdata = zlib.compress(rec)
    xdict = (
        b"<< /Type /XRef /Size " + str(n_objs).encode()
        + b" /W [1 4 2] /Index [0 " + str(n_objs).encode() + b"] /Root 1 0 R"
        + (b" /Info 8 0 R" if info else b"")
        + parms
        + b" /Length " + str(len(xdata)).encode()
        + b" /Filter /FlateDecode >>"
    )
    out.extend(f"7 0 obj\n".encode() + xdict + b"\nstream\n" + xdata + b"\nendstream\nendobj\n")
    out.extend(b"startxref\n" + str(offsets[7]).encode() + b"\n%%EOF\n")
    return bytes(out)


def image_only_pdf(width: float = 612.0, height: float = 792.0) -> bytes:
    """A syntactically valid PDF whose single page draws ONLY an image
    XObject — no text operators anywhere. The engine must degrade this
    to ``extract_status='image_only'`` (the deterministic analogue of
    the reference's image-based sniff that flips its OCR flag,
    reference: extractor/extractors/pdf_text_extractor.py:114-125).
    """
    img_data = zlib.compress(bytes(range(48)))  # 4x4 RGB "pixels"
    objects: List[bytes] = []
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objects.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")  # 2
    objects.append(
        (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_fmt(width)} "
            f"{_fmt(height)}] /Resources << /XObject << /Im1 5 0 R >> >> "
            f"/Contents 4 0 R >>"
        ).encode()
    )  # 3
    content = b"q 400 0 0 300 100 200 cm /Im1 Do Q"
    objects.append(
        f"<< /Length {len(content)} >>".encode()
        + b"\nstream\n" + content + b"\nendstream"
    )  # 4
    objects.append(
        b"<< /Type /XObject /Subtype /Image /Width 4 /Height 4 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode "
        b"/Length " + str(len(img_data)).encode() + b" >>\nstream\n"
        + img_data + b"\nendstream"
    )  # 5

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    n = len(objects) + 1
    out += f"xref\n0 {n}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n} /Root 1 0 R >>\nstartxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)
