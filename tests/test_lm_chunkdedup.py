"""Unigram-LM perplexity scoring and sub-document dedup ops."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from sparkfts.analysis import tokenize
from sparkfts.synth import gen_corpus
from sparkfts.tokens import sha1_doc_id


@pytest.fixture(scope="module")
def lmcorpus():
    return gen_corpus(150, seed=2718)


@pytest.fixture(scope="module")
def lmdocs(spark, lmcorpus):
    pdf = lmcorpus.to_pandas()
    pdf["doc_id"] = sha1_doc_id(pdf["url"])
    return spark.createDataFrame(pdf[["doc_id", "text"]])


def test_unigram_cross_entropy(spark, lmdocs, lmcorpus):
    from sparkfts.ops.lm import unigram_cross_entropy

    pdf = lmcorpus.to_pandas()
    ids = sha1_doc_id(pdf["url"])
    toks_by_doc = {
        int(i): tokenize(t) for i, t in zip(ids, pdf["text"])
    }
    cnt = Counter()
    for toks in toks_by_doc.values():
        cnt.update(toks)
    total, vocab, alpha = sum(cnt.values()), len(cnt), 1.0

    got = {
        r["doc_id"]: (r["n_tokens"], r["h"], r["ppl"])
        for r in unigram_cross_entropy(lmdocs, alpha=alpha).collect()
    }
    assert set(got) == {d for d, t in toks_by_doc.items() if t}
    for d, toks in toks_by_doc.items():
        if not toks:
            continue
        h = -sum(
            math.log((cnt[t] + alpha) / (total + alpha * vocab))
            for t in toks
        ) / len(toks)
        n, gh, gppl = got[d]
        assert n == len(toks)
        assert math.isclose(gh, h, rel_tol=1e-9)
        assert math.isclose(gppl, math.exp(h), rel_tol=1e-9)


def test_perplexity_buckets(spark, lmdocs):
    from sparkfts.ops.lm import perplexity_buckets, unigram_cross_entropy

    scored = unigram_cross_entropy(lmdocs)
    ppls = sorted(r["ppl"] for r in scored.collect())
    b0 = ppls[len(ppls) // 3]
    b1 = ppls[2 * len(ppls) // 3]
    rows = perplexity_buckets(scored, [b0, b1]).collect()
    for r in rows:
        if r["ppl"] < b0:
            assert r["bucket"] == 0
        elif r["ppl"] < b1:
            assert r["bucket"] == 1
        else:
            assert r["bucket"] == 2
    assert len({r["bucket"] for r in rows}) > 1, "fixture too uniform"


def _chunks(toks, w):
    return [
        " ".join(toks[i: i + w]) for i in range(0, len(toks), w)
    ]


def test_chunk_dedup_stats_token_windows(spark):
    from sparkfts.ops.chunkdedup import chunk_dedup_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),      # chunks: "a b c", "d e f"
            (2, "a b c x y z"),      # "a b c" duplicates doc 1
            (3, "d e f a b c"),      # both chunks duplicate doc 1/2... order
            (4, "q r"),              # single short chunk, unique
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n_chunks"], r["n_dropped"])
        for r in chunk_dedup_stats(docs, chunk_tokens=3).collect()
    }
    # winners: "a b c" -> (1,0); "d e f" -> (1,1); "x y z" -> (2,1);
    # "q r" -> (4,0)
    assert rows == {1: (2, 0), 2: (2, 1), 3: (2, 2), 4: (1, 0)}


def test_drop_duplicate_chunks(spark):
    from sparkfts.ops.chunkdedup import drop_duplicate_chunks

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c x y z"),
            (3, "d e f a b c"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["text"]
        for r in drop_duplicate_chunks(docs, chunk_tokens=3).collect()
    }
    # doc 3 loses every chunk -> disappears (fully duplicated)
    assert rows == {1: "a b c d e f", 2: "x y z"}


def test_chunk_dedup_separator_mode(spark):
    from sparkfts.ops.chunkdedup import chunk_dedup_stats

    docs = spark.createDataFrame(
        [
            (1, "intro para\n\nshared boilerplate\n\noutro"),
            (2, "other intro\n\nshared boilerplate"),
            (3, "  \n\nshared boilerplate\n\n"),  # empty parts dropped
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n_chunks"], r["n_dropped"])
        for r in chunk_dedup_stats(docs, separator="\n\n").collect()
    }
    assert rows == {1: (3, 0), 2: (2, 1), 3: (1, 1)}


def test_dup_ngram_coverage(spark):
    from sparkfts.ops.chunkdedup import dup_ngram_coverage

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),        # grams(3): abc bcd cde
            (2, "a b c q q q"),      # abc shared with 1; bcq cqq qqq unique
            (3, "x y"),              # too short: no grams
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n_grams"], r["n_dup"])
        for r in dup_ngram_coverage(docs, n=3).collect()
    }
    assert rows == {1: (3, 1), 2: (4, 1)}
    got = dup_ngram_coverage(docs, n=3).where("doc_id = 1").collect()[0]
    assert math.isclose(got["dup_frac"], 1 / 3)
