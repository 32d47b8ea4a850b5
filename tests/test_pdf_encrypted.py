"""Encrypted PDFs: RC4 standard security handler (R2/40-bit and
R3/128-bit), empty user password — authored fixtures with properly
computed /O, /U and file keys."""
from __future__ import annotations

import hashlib
import zlib

from pdf_extractor_ray.codecs.pdf_codec import _PAD, PdfCodec, _rc4

CONTENT = b"BT\n/F1 10 Tf\n50 700 Td\n(secret but readable line) Tj\nET\n"
FILE_ID = bytes(range(16))


def _file_key(o: bytes, p: int, r: int, keylen: int) -> bytes:
    h = hashlib.md5()
    h.update(_PAD)
    h.update(o[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(FILE_ID)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:keylen]).digest()
    return key[:keylen]


def _obj_key(fkey: bytes, num: int, gen: int, keylen: int) -> bytes:
    k = fkey + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    return hashlib.md5(k).digest()[: min(keylen + 5, 16)]


def _owner_entry(owner_pw: bytes, r: int, keylen: int) -> bytes:
    # Algorithm 3.3: O = RC4(md5(padded owner pw)[:keylen], padded user pw)
    h = hashlib.md5((owner_pw + _PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:keylen]
    o = _rc4(key, _PAD)  # empty user password → pad
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in key), o)
    return o


def _encrypted_pdf(r: int, length_bits: int) -> bytes:
    keylen = 5 if r == 2 else length_bits // 8
    p = -44  # typical permission bits
    o = _owner_entry(b"owner-secret", r, keylen)
    fkey = _file_key(o, p, r, keylen)
    comp = zlib.compress(CONTENT)
    enc_stream = _rc4(_obj_key(fkey, 4, 0, keylen), comp)
    u = _rc4(fkey, _PAD)  # R2 /U; R3 differs but the codec doesn't verify

    def hexs(b: bytes) -> bytes:
        return b"<" + b.hex().encode() + b">"

    v = 1 if r == 2 else 2
    out = bytearray(b"%PDF-1.4\n")
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
        (4, b"<< /Length " + str(len(enc_stream)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + enc_stream + b"\nendstream"),
        (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
        (6, b"<< /Filter /Standard /V " + str(v).encode() + b" /R " + str(r).encode()
            + b" /Length " + str(length_bits).encode()
            + b" /O " + hexs(o) + b" /U " + hexs(u)
            + b" /P " + str(p).encode() + b" >>"),
    ]
    for num, payload in objs:
        out.extend(f"{num} 0 obj\n".encode() + payload + b"\nendobj\n")
    out.extend(
        b"trailer\n<< /Root 1 0 R /Encrypt 6 0 R /ID ["
        + hexs(FILE_ID) + b" " + hexs(FILE_ID) + b"] >>\n%%EOF\n"
    )
    return bytes(out)


def test_rc4_40bit_r2():
    r = PdfCodec().extract(_encrypted_pdf(r=2, length_bits=40))
    assert r.status == "ok"
    assert r.text == "secret but readable line"


def test_rc4_128bit_r3():
    r = PdfCodec().extract(_encrypted_pdf(r=3, length_bits=128))
    assert r.status == "ok"
    assert r.text == "secret but readable line"


def test_v4_without_cf_falls_back_to_rc4():
    """V4 with no /CF dict (broken-but-seen-in-the-wild) decodes via
    the RC4 fallback when the payload actually is RC4."""
    pdf = _encrypted_pdf(r=2, length_bits=40).replace(b"/V 1", b"/V 4")
    r = PdfCodec().extract(pdf)
    assert r.text == "secret but readable line"


def test_aes256_degrades_not_garbage():
    """V5/AES-256 documents degrade to parse_error, never mojibake."""
    pdf = _encrypted_pdf(r=2, length_bits=40).replace(b"/V 1", b"/V 5")
    r = PdfCodec().extract(pdf)
    assert r.status == "parse_error"
    assert r.text == ""


def test_aes128_fips_vector():
    from pdf_extractor_ray.codecs.aes import _decrypt_block, _encrypt_block, _expand_key

    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    rks = _expand_key(key)
    assert _encrypt_block(pt, rks) == ct  # FIPS-197 C.1
    assert _decrypt_block(ct, rks) == pt


def _aesv2_pdf() -> bytes:
    from pdf_extractor_ray.codecs.aes import aes128_cbc_encrypt

    r, keylen, p = 4, 16, -44
    o = _owner_entry(b"owner-secret", 3, keylen)  # R>=3 algorithm
    fkey = _file_key(o, p, 3, keylen)
    comp = zlib.compress(CONTENT)
    objkey = hashlib.md5(
        fkey + (4).to_bytes(3, "little") + (0).to_bytes(2, "little") + b"sAlT"
    ).digest()[:16]
    enc_stream = aes128_cbc_encrypt(objkey, bytes(range(16)), comp)
    u = _rc4(fkey, _PAD)

    def hexs(b: bytes) -> bytes:
        return b"<" + b.hex().encode() + b">"

    out = bytearray(b"%PDF-1.6\n")
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
        (4, b"<< /Length " + str(len(enc_stream)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + enc_stream + b"\nendstream"),
        (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
        (6, b"<< /Filter /Standard /V 4 /R 4 /Length 128 "
            b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >> "
            b"/StmF /StdCF /StrF /StdCF "
            b"/O " + hexs(o) + b" /U " + hexs(u) + b" /P " + str(p).encode() + b" >>"),
    ]
    for num, payload in objs:
        out.extend(f"{num} 0 obj\n".encode() + payload + b"\nendobj\n")
    out.extend(
        b"trailer\n<< /Root 1 0 R /Encrypt 6 0 R /ID ["
        + hexs(FILE_ID) + b" " + hexs(FILE_ID) + b"] >>\n%%EOF\n"
    )
    return bytes(out)


def test_aesv2_document_decrypts():
    r = PdfCodec().extract(_aesv2_pdf())
    assert r.status == "ok"
    assert r.text == "secret but readable line"


def test_encrypted_info_string_decrypts():
    """Trailer /Info strings are RC4-encrypted with the Info OBJECT's
    key (num/gen), not the file key — extract_info must decrypt."""
    from pdf_extractor_ray.codecs.pdf_codec import extract_info

    r, length_bits = 3, 128
    keylen = length_bits // 8
    p = -44
    o = _owner_entry(b"owner-secret", r, keylen)
    fkey = _file_key(o, p, r, keylen)
    comp = zlib.compress(CONTENT)
    enc_stream = _rc4(_obj_key(fkey, 4, 0, keylen), comp)
    title_ct = _rc4(_obj_key(fkey, 7, 0, keylen), b"Secret Title")
    u = _rc4(fkey, _PAD)

    def hexs(b: bytes) -> bytes:
        return b"<" + b.hex().encode() + b">"

    out = bytearray(b"%PDF-1.4\n")
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
        (4, b"<< /Length " + str(len(enc_stream)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + enc_stream + b"\nendstream"),
        (5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
        (6, b"<< /Filter /Standard /V 2 /R 3 /Length 128"
            + b" /O " + hexs(o) + b" /U " + hexs(u)
            + b" /P " + str(p).encode() + b" >>"),
        (7, b"<< /Title " + hexs(title_ct) + b" >>"),
    ]
    for num, payload in objs:
        out.extend(f"{num} 0 obj\n".encode() + payload + b"\nendobj\n")
    out.extend(
        b"trailer\n<< /Root 1 0 R /Encrypt 6 0 R /Info 7 0 R /ID ["
        + hexs(FILE_ID) + b" " + hexs(FILE_ID) + b"] >>\n%%EOF\n"
    )
    info = extract_info(bytes(out))
    assert info["title"] == "Secret Title"
    assert info["author"] is None


def test_fixture_builder_encrypt_roundtrip():
    """build_pdf(encrypt=True) wraps the standard security handler
    (V2 R3 RC4-128); the codec must produce byte-identical text and
    Info versus the plaintext build across all classic builders."""
    from pdf_extractor_ray.codecs.pdf_codec import extract_info
    from pdf_extractor_ray.fixtures.pdf_build import (
        simple_text_pdf,
        table_pdf,
        two_column_pdf,
    )

    info = {"Title": "enc title", "Producer": "p"}
    builders = [
        lambda e: simple_text_pdf([["one two", "three four"]], info=info, encrypt=e),
        lambda e: simple_text_pdf([["tj words here"]], use_tj=True, info=info, encrypt=e),
        lambda e: two_column_pdf(["l1", "l2"], ["r1"], info=info, encrypt=e),
        lambda e: table_pdf([["a", "b"], ["c", "d"]], prefix_lines=["pre"],
                            info=info, encrypt=e),
    ]
    for build in builders:
        plain, enc = build(False), build(True)
        assert b"Encrypt" in enc and b"Encrypt" not in plain
        rp, re_ = PdfCodec().extract(plain), PdfCodec().extract(enc)
        assert re_.status == "ok"
        assert re_.text == rp.text
        assert extract_info(enc) == extract_info(plain)
        assert extract_info(enc)["title"] == "enc title"


def test_corpus_encrypted_subset_is_planted():
    """doc_id % 23 == 9 classic PDFs carry the Encrypt dict; goldens
    hold (covered by the byte-identity oracles over the same rows)."""
    from pdf_extractor_ray.sources.corpus import _pdf_doc

    text = " ".join(f"w{i}" for i in range(40))
    enc_payload, _ = _pdf_doc(147, text, False)   # 147 % 23 == 9, classic
    plain_payload, _ = _pdf_doc(137, text, False)
    assert b"Encrypt" in enc_payload
    assert b"Encrypt" not in plain_payload


def test_fixture_builder_aesv2_roundtrip():
    """build_pdf(encrypt='aes') = V4 R4 /AESV2: streams AND Info
    strings AES-128-CBC with per-object keys; byte-identical decode."""
    from pdf_extractor_ray.codecs.pdf_codec import extract_info
    from pdf_extractor_ray.fixtures.pdf_build import simple_text_pdf, table_pdf

    info = {"Title": "aes title", "Author": "A"}
    for build in (
        lambda e: simple_text_pdf([["alpha beta", "gamma"]], info=info, encrypt=e),
        lambda e: table_pdf([["a", "b"], ["c", "d"]], info=info, encrypt=e),
    ):
        plain, enc = build(False), build("aes")
        assert b"AESV2" in enc
        rp, re_ = PdfCodec().extract(plain), PdfCodec().extract(enc)
        assert re_.status == "ok" and re_.text == rp.text
        assert extract_info(enc) == extract_info(plain)
