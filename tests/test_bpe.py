"""BPE tokenizer training: word_freqs pass, merge loop, encoder."""
from __future__ import annotations

import collections

import pyarrow as pa
import pytest

from pdf_extractor_ray.functions.bpe import (
    BpeEncodeStage,
    _words_of,
    bpe_pipeline,
    bpe_train,
    encode_word,
    word_freqs,
)


# ----------------------------------------------------------- merge loop
def test_bpe_train_classic_sennrich_example():
    # the canonical corpus from Sennrich et al. 2016 §3.2
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train(freqs, n_merges=4)
    # 'es' appears 6+3=9 times — the first merge; then 'es'+'t' (9),
    # then 'est'+'</w>' (9), then 'l'+'o' (7)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert merges[3] == ("l", "o")


def test_bpe_train_matches_naive_recount_reference():
    """The indexed delta-update loop must agree with a from-scratch
    recount-every-round reference on a nontrivial corpus."""
    words = ["banana", "bandana", "ban", "anna", "nab", "abba", "baan"]
    freqs = {w: i + 1 for i, w in enumerate(words)}

    def naive(freqs, n_merges):
        seqs = {w: list(w) + ["</w>"] for w in freqs}
        merges = []
        for _ in range(n_merges):
            pc = collections.Counter()
            for w, seq in seqs.items():
                for p in zip(seq, seq[1:]):
                    pc[p] += freqs[w]
            cands = [(-c, p) for p, c in pc.items() if c >= 2]
            if not cands:
                break
            best = min(cands)[1]
            merges.append(best)
            for w, seq in seqs.items():
                out, i = [], 0
                while i < len(seq):
                    if (i + 1 < len(seq) and seq[i] == best[0]
                            and seq[i + 1] == best[1]):
                        out.append(best[0] + best[1])
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seqs[w] = out
        return merges

    assert bpe_train(freqs, 12) == naive(freqs, 12)


def test_bpe_train_stops_when_no_pair_repeats():
    merges = bpe_train({"ab": 1}, n_merges=50)
    assert merges == []  # every pair occurs once — nothing to learn


def test_bpe_train_deterministic_under_input_order():
    f1 = [("low", 5), ("newest", 6), ("widest", 3)]
    f2 = list(reversed(f1))
    assert bpe_train(f1, 8) == bpe_train(f2, 8)


# -------------------------------------------------------------- encoder
def test_encode_word_applies_merges_in_rank_order():
    merges = bpe_train({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 10)
    ranks = {m: i for i, m in enumerate(merges)}
    # 'lowest' was never seen, but shares learned subwords
    toks = encode_word("lowest", ranks)
    assert "".join(toks) == "lowest</w>"
    assert "est</w>" in toks or "est" in "".join(toks)
    # no learnable pair → one symbol per char + </w>
    assert encode_word("xyz", {}) == ["x", "y", "z", "</w>"]


def test_encode_stage_counts(ray_session):
    import ray.data

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["low lower newest", ""]),
    }))
    merges = bpe_train({"low": 5, "lower": 2, "newest": 6}, 10)
    out = docs.map_batches(
        BpeEncodeStage, fn_constructor_args=(merges,),
        batch_format="pyarrow", concurrency=1,
    ).to_pandas().set_index("doc_id")
    ranks = {m: i for i, m in enumerate(merges)}
    want = sum(len(encode_word(w, ranks)) for w in ["low", "lower", "newest"])
    assert out.loc[1, "n_words"] == 3
    assert out.loc[1, "n_bpe_tokens"] == want
    assert out.loc[2, "n_words"] == 0 and out.loc[2, "n_bpe_tokens"] == 0


# ------------------------------------------------------------ word_freqs
def test_word_freqs_matches_local_counter(ray_session):
    import ray.data

    texts = ["the cat sat", "the cat ran", "a dog ran fast!", "THE Cat"]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    got = {
        r["word"]: r["n"]
        for r in word_freqs(docs, top_words=100).take_all()
    }
    want = collections.Counter()
    for t in texts:
        want.update(_words_of(t))
    assert got == dict(want)


def test_word_freqs_cap_keeps_most_frequent(ray_session):
    import ray.data

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["aa aa aa bb bb cc"]),
    }))
    rows = word_freqs(docs, top_words=2).take_all()
    assert [(r["word"], r["n"]) for r in rows] == [("aa", 3), ("bb", 2)]


def test_bpe_pipeline_end_to_end(ray_session):
    import ray.data

    texts = ["the quick brown fox", "the quiet queen", "the the the"] * 5
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(15), pa.int64()),
        "text": pa.array(texts),
    }))
    merges, encoded = bpe_pipeline(docs, top_words=50, n_merges=20)
    df = encoded.to_pandas()
    assert len(df) == 15
    assert (df["n_bpe_tokens"] >= df["n_words"]).all()  # ≥1 token per word
    # merged subwords shrink token counts vs no merges at all
    no_merge = docs.map_batches(
        BpeEncodeStage, fn_constructor_args=([],),
        batch_format="pyarrow", concurrency=1,
    ).to_pandas()
    assert df["n_bpe_tokens"].sum() < no_merge["n_bpe_tokens"].sum()
    # determinism across runs
    merges2, _ = bpe_pipeline(docs, top_words=50, n_merges=20)
    assert merges == merges2
