"""Winnowing fingerprints: kernel parity, guarantee, distributed path."""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest

from pdf_extractor_ray.functions.fingerprint import (
    winnow_dup_pairs,
    winnow_fingerprints,
)


def _naive(text: str, k: int, w: int) -> np.ndarray:
    """Per-window reference implementation (pure Python, O(n·w))."""
    b = re.sub(r"\s+", " ", text.lower().strip()).encode()
    B, M = 1000003, 2 ** 64

    def mix(x: int) -> int:
        x = (x + 0x9E3779B97F4A7C15) % M
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) % M
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) % M
        x ^= x >> 31
        return x

    hs = []
    for i in range(len(b) - k + 1):
        h = 0
        for c in b[i : i + k]:
            h = (h * B + c) % M
        hs.append(mix(h))
    if not hs:
        return np.array([], dtype=np.uint64)
    if len(hs) <= w:
        return np.array([min(hs)], dtype=np.uint64)
    sel = {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}
    return np.array(sorted(sel), dtype=np.uint64)


@pytest.mark.parametrize("k,w", [(8, 16), (25, 50), (5, 4)])
def test_kernel_matches_naive(k, w):
    text = ("The quick brown fox jumps over the lazy dog. "
            "Pack my box with five dozen liquor jugs! ") * 7
    got = winnow_fingerprints(text, k, w)
    want = _naive(text, k, w)
    assert np.array_equal(got, want)


def test_kernel_edge_cases():
    assert len(winnow_fingerprints("")) == 0
    # shorter than one gram: one whole-text fingerprint, deterministic
    a = winnow_fingerprints("ab", k=8)
    assert len(a) == 1
    assert np.array_equal(a, winnow_fingerprints("ab", k=8))
    # whitespace/case normalization
    assert np.array_equal(
        winnow_fingerprints("Hello   World FOO BAR baz quux", k=8),
        winnow_fingerprints("hello world\n\tfoo  bar baz quux", k=8),
    )


def test_shared_substring_guarantee():
    # any shared substring of length >= w + k - 1 yields >= 1 shared fp
    k, w = 8, 16
    core = "x" * 0  # noqa: F841  (documentation only)
    shared = "this exact shared passage is definitely long enough to survive"
    assert len(shared) >= w + k - 1
    fa = winnow_fingerprints("AAA " + shared + " BBB", k, w)
    fb = winnow_fingerprints("CCCCC " + shared + " DDDDD", k, w)
    assert len(np.intersect1d(fa, fb)) >= 1


def test_unrelated_docs_share_nothing():
    import random

    rnd = random.Random(7)
    u1 = " ".join("".join(rnd.choices("abcdefghij", k=6)) for _ in range(150))
    u2 = " ".join("".join(rnd.choices("klmnopqrst", k=6)) for _ in range(150))
    assert len(np.intersect1d(winnow_fingerprints(u1), winnow_fingerprints(u2))) == 0


def test_winnow_dup_pairs_distributed(ray_session):
    import ray.data

    base = ("the common corpus of shared knowledge flows through every "
            "channel of the network reaching out to distant nodes " * 4)
    rows = {
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            base + " tail one",
            base + " a different small tail",
            "completely unrelated content about cooking pasta with garlic "
            "and olive oil in a large pot of salted boiling water " * 4,
            base + " third variant tail",
        ]),
    }
    ds = ray.data.from_arrow(pa.table(rows))
    pairs = winnow_dup_pairs(ds, min_shared=3).to_pandas()
    got = set(zip(pairs.doc_a, pairs.doc_b))
    assert got == {(1, 2), (1, 4), (2, 4)}
    assert (pairs["n_shared"] >= 3).all()


def test_max_bucket_drops_common_fingerprints(ray_session):
    import ray.data

    # 5 identical docs: every fingerprint bucket has size 5 — a
    # max_bucket of 4 drops them all, so no pairs are produced
    t = "the same boilerplate text repeated in every single document " * 5
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "text": pa.array([t] * 5),
    }))
    none = winnow_dup_pairs(ds, min_shared=1, max_bucket=4).to_pandas()
    assert len(none) == 0
    some = winnow_dup_pairs(ds, min_shared=1, max_bucket=64).to_pandas()
    assert len(some) == 10  # all C(5,2) pairs
