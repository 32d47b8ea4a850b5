"""Pure-Python AES-128 decryption (FIPS-197) for encrypted PDF streams.

Only decryption (inverse cipher) + CBC mode is implemented — exactly
what the PDF /AESV2 crypt filter needs. No external crypto libraries
exist in this environment; content streams are KB-scale so a table-
driven Python implementation (~1 MB/s) is ample.

Verified against the FIPS-197 appendix C.1 vector in tests.
"""
from __future__ import annotations

from typing import List

_SBOX = [
    0x63, 0x7C, 0x77, 0x7B, 0xF2, 0x6B, 0x6F, 0xC5, 0x30, 0x01, 0x67, 0x2B,
    0xFE, 0xD7, 0xAB, 0x76, 0xCA, 0x82, 0xC9, 0x7D, 0xFA, 0x59, 0x47, 0xF0,
    0xAD, 0xD4, 0xA2, 0xAF, 0x9C, 0xA4, 0x72, 0xC0, 0xB7, 0xFD, 0x93, 0x26,
    0x36, 0x3F, 0xF7, 0xCC, 0x34, 0xA5, 0xE5, 0xF1, 0x71, 0xD8, 0x31, 0x15,
    0x04, 0xC7, 0x23, 0xC3, 0x18, 0x96, 0x05, 0x9A, 0x07, 0x12, 0x80, 0xE2,
    0xEB, 0x27, 0xB2, 0x75, 0x09, 0x83, 0x2C, 0x1A, 0x1B, 0x6E, 0x5A, 0xA0,
    0x52, 0x3B, 0xD6, 0xB3, 0x29, 0xE3, 0x2F, 0x84, 0x53, 0xD1, 0x00, 0xED,
    0x20, 0xFC, 0xB1, 0x5B, 0x6A, 0xCB, 0xBE, 0x39, 0x4A, 0x4C, 0x58, 0xCF,
    0xD0, 0xEF, 0xAA, 0xFB, 0x43, 0x4D, 0x33, 0x85, 0x45, 0xF9, 0x02, 0x7F,
    0x50, 0x3C, 0x9F, 0xA8, 0x51, 0xA3, 0x40, 0x8F, 0x92, 0x9D, 0x38, 0xF5,
    0xBC, 0xB6, 0xDA, 0x21, 0x10, 0xFF, 0xF3, 0xD2, 0xCD, 0x0C, 0x13, 0xEC,
    0x5F, 0x97, 0x44, 0x17, 0xC4, 0xA7, 0x7E, 0x3D, 0x64, 0x5D, 0x19, 0x73,
    0x60, 0x81, 0x4F, 0xDC, 0x22, 0x2A, 0x90, 0x88, 0x46, 0xEE, 0xB8, 0x14,
    0xDE, 0x5E, 0x0B, 0xDB, 0xE0, 0x32, 0x3A, 0x0A, 0x49, 0x06, 0x24, 0x5C,
    0xC2, 0xD3, 0xAC, 0x62, 0x91, 0x95, 0xE4, 0x79, 0xE7, 0xC8, 0x37, 0x6D,
    0x8D, 0xD5, 0x4E, 0xA9, 0x6C, 0x56, 0xF4, 0xEA, 0x65, 0x7A, 0xAE, 0x08,
    0xBA, 0x78, 0x25, 0x2E, 0x1C, 0xA6, 0xB4, 0xC6, 0xE8, 0xDD, 0x74, 0x1F,
    0x4B, 0xBD, 0x8B, 0x8A, 0x70, 0x3E, 0xB5, 0x66, 0x48, 0x03, 0xF6, 0x0E,
    0x61, 0x35, 0x57, 0xB9, 0x86, 0xC1, 0x1D, 0x9E, 0xE1, 0xF8, 0x98, 0x11,
    0x69, 0xD9, 0x8E, 0x94, 0x9B, 0x1E, 0x87, 0xE9, 0xCE, 0x55, 0x28, 0xDF,
    0x8C, 0xA1, 0x89, 0x0D, 0xBF, 0xE6, 0x42, 0x68, 0x41, 0x99, 0x2D, 0x0F,
    0xB0, 0x54, 0xBB, 0x16,
]
_INV_SBOX = [0] * 256
for i, v in enumerate(_SBOX):
    _INV_SBOX[v] = i

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _xtime(a: int) -> int:
    a <<= 1
    if a & 0x100:
        a ^= 0x11B
    return a & 0xFF


def _mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _expand_key(key: bytes) -> List[List[int]]:
    """128-bit key → 11 round keys (as 16-byte lists)."""
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(11)]


def _inv_mix_columns(s: List[int]) -> List[int]:
    out = [0] * 16
    for c in range(4):
        col = s[4 * c : 4 * c + 4]
        out[4 * c + 0] = _mul(col[0], 14) ^ _mul(col[1], 11) ^ _mul(col[2], 13) ^ _mul(col[3], 9)
        out[4 * c + 1] = _mul(col[0], 9) ^ _mul(col[1], 14) ^ _mul(col[2], 11) ^ _mul(col[3], 13)
        out[4 * c + 2] = _mul(col[0], 13) ^ _mul(col[1], 9) ^ _mul(col[2], 14) ^ _mul(col[3], 11)
        out[4 * c + 3] = _mul(col[0], 11) ^ _mul(col[1], 13) ^ _mul(col[2], 9) ^ _mul(col[3], 14)
    return out


def _decrypt_block(block: bytes, round_keys: List[List[int]]) -> bytes:
    # state is column-major: s[4c+r]
    s = [block[4 * c + r] for c in range(4) for r in range(4)]
    s = [a ^ b for a, b in zip(s, round_keys[10])]
    for rnd in range(9, 0, -1):
        # InvShiftRows: row r rotates right by r; state index = 4c+r
        t = list(s)
        for r in range(1, 4):
            for c in range(4):
                t[4 * c + r] = s[4 * ((c - r) % 4) + r]
        # InvSubBytes
        t = [_INV_SBOX[b] for b in t]
        # AddRoundKey
        t = [a ^ b for a, b in zip(t, round_keys[rnd])]
        # InvMixColumns
        s = _inv_mix_columns(t)
    t = list(s)
    for r in range(1, 4):
        for c in range(4):
            t[4 * c + r] = s[4 * ((c - r) % 4) + r]
    t = [_INV_SBOX[b] for b in t]
    t = [a ^ b for a, b in zip(t, round_keys[0])]
    return bytes(t[4 * c + r] for c in range(4) for r in range(4))


# ----------------------------------------------- vectorized decryption
# CBC DECRYPTION is parallel across blocks (each block decrypts with
# ECB then XORs the PREVIOUS ciphertext block), so the whole stream
# decrypts as a handful of numpy gathers/XORs per round over an
# (n_blocks, 16) array — measured ~20x faster than the per-block
# Python loop on KB-scale PDF streams (the scalar _decrypt_block stays
# as the FIPS-vector reference and the encrypt side stays scalar: it
# is fixture-authoring only and inherently sequential in CBC).
import numpy as _np

_INV_SBOX_NP = _np.array(_INV_SBOX, dtype=_np.uint8)
_INV_SHIFT = _np.array(
    [4 * ((c - r) % 4) + r for c in range(4) for r in range(4)],
    dtype=_np.intp,
)
_M9, _M11, _M13, _M14 = (
    _np.array([_mul(x, k) for x in range(256)], dtype=_np.uint8)
    for k in (9, 11, 13, 14)
)


def _inv_mix_columns_np(s: "_np.ndarray") -> "_np.ndarray":
    cols = s.reshape(-1, 4, 4)
    a, b, c, d = cols[..., 0], cols[..., 1], cols[..., 2], cols[..., 3]
    out = _np.empty_like(cols)
    out[..., 0] = _M14[a] ^ _M11[b] ^ _M13[c] ^ _M9[d]
    out[..., 1] = _M9[a] ^ _M14[b] ^ _M11[c] ^ _M13[d]
    out[..., 2] = _M13[a] ^ _M9[b] ^ _M14[c] ^ _M11[d]
    out[..., 3] = _M11[a] ^ _M13[b] ^ _M9[c] ^ _M14[d]
    return out.reshape(-1, 16)


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2 layout: 16-byte IV prefix + CBC ciphertext; strips
    PKCS#5 padding. Returns b'' for malformed input (degrade)."""
    if len(key) != 16 or len(data) < 32 or len(data) % 16:
        return b""
    rks = _np.array(_expand_key(key), dtype=_np.uint8)  # (11, 16)
    buf = _np.frombuffer(data, dtype=_np.uint8)
    iv, ct = buf[:16], buf[16:].reshape(-1, 16)
    s = ct ^ rks[10]
    for rnd in range(9, 0, -1):
        s = _INV_SBOX_NP[s[:, _INV_SHIFT]]
        s ^= rks[rnd]
        s = _inv_mix_columns_np(s)
    s = _INV_SBOX_NP[s[:, _INV_SHIFT]]
    s ^= rks[0]
    prev = _np.vstack([iv[None, :], ct[:-1]])
    out = (s ^ prev).tobytes()
    pad = out[-1]
    if 1 <= pad <= 16:
        out = out[:-pad]
    return out


# test-support: forward cipher (CBC encrypt) so fixtures can author
# AES-encrypted PDFs without external libraries. GF multiplies come
# from 256-entry tables — the bit-loop _mul dominated fixture
# synthesis (~11 ms per AES document) before.
_MUL2 = [_mul(x, 2) for x in range(256)]
_MUL3 = [_mul(x, 3) for x in range(256)]


def _mix_columns(s: List[int]) -> List[int]:
    out = [0] * 16
    for c in range(4):
        a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
        out[4 * c + 0] = _MUL2[a0] ^ _MUL3[a1] ^ a2 ^ a3
        out[4 * c + 1] = a0 ^ _MUL2[a1] ^ _MUL3[a2] ^ a3
        out[4 * c + 2] = a0 ^ a1 ^ _MUL2[a2] ^ _MUL3[a3]
        out[4 * c + 3] = _MUL3[a0] ^ a1 ^ a2 ^ _MUL2[a3]
    return out


def _encrypt_block(block: bytes, round_keys: List[List[int]]) -> bytes:
    s = [block[4 * c + r] for c in range(4) for r in range(4)]
    s = [a ^ b for a, b in zip(s, round_keys[0])]
    for rnd in range(1, 10):
        s = [_SBOX[b] for b in s]
        t = list(s)
        for r in range(1, 4):
            for c in range(4):
                t[4 * c + r] = s[4 * ((c + r) % 4) + r]
        s = _mix_columns(t)
        s = [a ^ b for a, b in zip(s, round_keys[rnd])]
    s = [_SBOX[b] for b in s]
    t = list(s)
    for r in range(1, 4):
        for c in range(4):
            t[4 * c + r] = s[4 * ((c + r) % 4) + r]
    s = [a ^ b for a, b in zip(t, round_keys[10])]
    return bytes(s[4 * c + r] for c in range(4) for r in range(4))


def aes128_cbc_encrypt(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """Fixture-authoring helper: IV + CBC ciphertext, PKCS#5 padded."""
    rks = _expand_key(key)
    pad = 16 - (len(plain) % 16)
    plain = plain + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(plain), 16):
        block = bytes(a ^ b for a, b in zip(plain[i : i + 16], prev))
        ct = _encrypt_block(block, rks)
        out.extend(ct)
        prev = ct
    return bytes(out)
