"""Unigram-LM (SentencePiece-style) tokenizer training + segmentation:
pinned hard-EM spec vs an independent brute-force mirror."""

from __future__ import annotations

import itertools
import math
from collections import Counter

import pytest

from sparkfts.analysis import tokenize
from sparkfts.ops.unigram import (
    _viterbi,
    apply_unigram,
    learn_unigram,
)


def _brute_best_seg(word, logp, max_len):
    """Enumerate EVERY segmentation; return the best score (float)."""
    n = len(word)
    best = None
    # compositions of n into parts <= max_len
    def gen(i):
        if i == n:
            yield []
            return
        for ln in range(1, min(max_len, n - i) + 1):
            piece = word[i:i + ln]
            if piece not in logp:
                continue
            for rest in gen(i + ln):
                yield [piece] + rest

    for seg in gen(0):
        s = sum(logp[p] for p in seg)
        if best is None or s > best:
            best = s
    return best


def test_viterbi_optimal_vs_enumeration():
    logp = {
        "a": -1.0, "b": -1.5, "ab": -1.8, "ba": -2.0, "aba": -2.5,
        "bb": -2.2, "abab": -3.0,
    }
    for word in ("abab", "ababa", "bbab", "aab", "a", "bb"):
        got = _viterbi(word, logp, max_len=4)
        assert "".join(got) == word
        score = sum(logp[p] for p in got)
        brute = _brute_best_seg(word, logp, 4)
        assert math.isclose(score, brute, rel_tol=1e-12), word


def test_viterbi_tie_break_prefers_longer_last_piece():
    # two segmentations of equal score: ('a','b') vs ('ab',)
    logp = {"a": -1.0, "b": -1.0, "ab": -2.0}
    assert _viterbi("ab", logp, 2) == ["ab"]


def test_viterbi_unk_and_fail_loud():
    logp = {"a": -1.0}
    with pytest.raises(ValueError, match="not segmentable"):
        _viterbi("ax", logp, 2)
    assert _viterbi("ax", logp, 2, unk_logp=-100.0) == ["a", "x"]


def test_learn_unigram_micro(spark):
    rows = [(0, "lower lower lower lowest"), (1, "low low lowest")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = learn_unigram(df, vocab_size=8, em_iters=3, max_piece_len=6)
    pieces = {p for p, _ in vocab}
    # the alphabet always survives
    assert {"l", "o", "w", "e", "r", "s", "t"} <= pieces
    # the dominant shared stem is learned as a piece
    assert "low" in pieces or "lowe" in pieces or "lower" in pieces
    # logprobs normalize over the KEPT pieces and sort desc
    lps = [lp for _, lp in vocab]
    assert lps == sorted(lps, reverse=True)
    # deterministic across runs
    assert vocab == learn_unigram(df, vocab_size=8, em_iters=3,
                                  max_piece_len=6)
    with pytest.raises(ValueError):
        learn_unigram(df, vocab_size=0)


def test_apply_unigram_counts(spark):
    rows = [(0, "low lower"), (1, "lowest unknownzzz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = learn_unigram(df, vocab_size=10, em_iters=2)
    got = {r["doc_id"]: r for r in apply_unigram(df, vocab).collect()}
    logp = dict(vocab)
    for doc_id, text in rows:
        words = tokenize(text)
        exp = sum(
            len(_viterbi(w, logp, 8, unk_logp=-100.0)) for w in words
        )
        assert got[doc_id]["n_words"] == len(words)
        assert got[doc_id]["n_unigram_tokens"] == exp
    # a piece-covered word costs fewer tokens than its char count
    assert got[0]["n_unigram_tokens"] < sum(len(w) for w in tokenize(rows[0][1]))


def test_unigram_corpus_compression(spark, pages_df):
    """On the synthetic corpus a trained vocab must beat char-level
    segmentation (the whole point of subword training)."""
    docs = pages_df.selectExpr(
        "cast(hash(url) as long) as doc_id", "text"
    )
    vocab = learn_unigram(docs, vocab_size=300, em_iters=2,
                          max_words=2000)
    out = apply_unigram(docs, vocab)
    from pyspark.sql import functions as F

    row = out.agg(
        F.sum("n_unigram_tokens").alias("pieces"),
        F.sum("n_words").alias("words"),
    ).collect()[0]
    assert row["pieces"] >= row["words"]  # >= one piece per word
    n_chars = docs.select(
        F.sum(F.length(F.regexp_replace(F.lower("text"), "[^a-z0-9]", "")))
    ).collect()[0][0]
    assert row["pieces"] < n_chars  # strictly better than chars
