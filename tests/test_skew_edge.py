"""Robustness: pathological head-term skew + empty/degenerate corpora."""

from __future__ import annotations

import pandas as pd
import pytest

from oracle.bm25 import BM25Oracle
from sparkfts.index import build_index, load_postings, read_meta, salt_check
from sparkfts.query import bm25_index_batch
from sparkfts.tokens import tokenize_docs


@pytest.fixture(scope="module")
def skewed_index(spark, tmp_path_factory):
    """Every doc contains 'ubiquitous' (df = N): the worst-case head term."""
    n = 2000
    rows = [
        (
            f"https://skew.example/{i}",
            None,
            b"",
            f"ubiquitous filler{i % 7} rare{i}" ,
            "en",
        )
        for i in range(n)
    ]
    pdf = pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )
    pages = spark.createDataFrame(pdf)
    d = str(tmp_path_factory.mktemp("skew_idx"))
    build_index(pages.select("url", "text", "lang"), d, n_shards=8, n_tbuckets=4)
    return d, pages, n


def test_skew_groups_bounded(spark, skewed_index):
    d, pages, n = skewed_index
    # the salted (term, shard) key bounds the head term's largest posting
    # group to ~df/n_shards — no single reducer sees all N postings
    rows = (
        load_postings(spark, d)
        .where("term = 'ubiquitous'")
        .select("shard", "df_shard")
        .collect()
    )
    assert sum(r["df_shard"] for r in rows) == n
    assert len(rows) == 8
    # hash-sharded: binomial around n/8, allow ~5 sigma headroom
    assert max(r["df_shard"] for r in rows) <= int(n / 8 * 1.3)

    report = salt_check(tokenize_docs(
        pages.selectExpr("cast(hash(url) as long) doc_id", "text")
    ), n_shards=8)
    assert report[0]["df"] == n  # visibility tool surfaces the head term


def test_skew_query_rank_identical(spark, skewed_index):
    d, pages, n = skewed_index
    from sparkfts.tokens import sha1_doc_id

    urls = [r["url"] for r in pages.select("url").collect()]
    texts = [r["text"] for r in pages.select("text").collect()]
    ids = sha1_doc_id(pd.Series(urls))
    oracle = BM25Oracle(zip(ids.tolist(), texts))
    for q in ("ubiquitous", "ubiquitous filler3", "rare17"):
        got = bm25_index_batch(spark, d, [(0, q, 10)]).collect()
        exp = oracle.search(q, k=10)
        assert [r["doc_id"] for r in got] == [doc for doc, _ in exp], q


def test_empty_corpus_builds_and_queries(spark, tmp_path):
    empty = spark.createDataFrame(
        [], "url string, text string, lang string"
    )
    d = str(tmp_path / "empty_idx")
    meta = build_index(empty, d, n_shards=2, n_tbuckets=2)
    assert meta["n_docs"] == 0 and meta["avgdl"] == 0.0
    assert read_meta(d)["n_docs"] == 0
    got = bm25_index_batch(spark, d, [(0, "anything", 10)]).collect()
    assert got == []


def test_whitespace_only_docs(spark, tmp_path):
    pages = spark.createDataFrame(
        [("u1", "   ", "en"), ("u2", "real words here", "en")],
        "url string, text string, lang string",
    )
    d = str(tmp_path / "ws_idx")
    meta = build_index(pages, d, n_shards=2, n_tbuckets=2)
    # zero-token doc still counts in N (oracle parity: avgdl denominator)
    assert meta["n_docs"] == 2
    got = bm25_index_batch(spark, d, [(0, "real", 5)]).collect()
    assert len(got) == 1
