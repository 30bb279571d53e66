"""Fuzzy (AUTO) BM25: oracle unit tests + Spark rank-identity.

Pins the reference's ``fuzziness: "AUTO"`` request (reference
ElasticsearchToNeo4jSync.py:97) to the executable semantics of
``oracle/fuzzy.py`` and asserts the Spark engine matches rank-identically
(SURVEY.md §2.7).
"""

from __future__ import annotations

import pytest

from oracle.bm25 import BM25Oracle
from oracle.fuzzy import expand, fuzzy_search, levenshtein
from sparkfts.analysis import auto_fuzz
from sparkfts.fuzzy import bm25_fuzzy_scan_batch
from sparkfts.stats import avgdl_of
from sparkfts.tokens import prepare_pages, sha1_doc_id, tokenize_docs


def test_auto_fuzz_bands():
    assert auto_fuzz("") == 0
    assert auto_fuzz("ab") == 0
    assert auto_fuzz("abc") == 1
    assert auto_fuzz("abcde") == 1
    assert auto_fuzz("abcdef") == 2
    assert auto_fuzz("abcdefghij") == 2


def test_levenshtein_matches_known_values():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("flaw", "lawn") == 2
    assert levenshtein("spark", "spork") == 1


def test_expand_respects_auto_distance():
    d = ["spark", "spork", "sparkle", "stark", "xy", "x"]
    got = expand("spark", d)  # len 5 -> maxd 1
    assert ("spark", 0) in got and ("spork", 1) in got and ("stark", 1) in got
    assert all(t != "sparkle" for t, _ in got)  # dist 2 > 1
    # short terms get distance 0 (exact only)
    assert expand("xy", d) == [("xy", 0)]


def test_fuzzy_exact_terms_supersets_plain_search():
    docs = [
        (1, "the quick brown fox"),
        (2, "the quik brown fox"),  # typo'd quick
        (3, "wholly unrelated text"),
    ]
    oracle = BM25Oracle(docs)
    plain = oracle.search("quick brown", k=10)
    fuzzy = fuzzy_search(oracle, "quick brown", k=10)
    # plain only matches doc 1; fuzzy matches the typo'd doc 2 as well
    assert [d for d, _ in plain] == [1]
    assert {d for d, _ in fuzzy} == {1, 2}
    # exact-match doc outranks the typo'd one (boost 1.0 vs 0.8)
    assert fuzzy[0][0] in (1, 2) and len(fuzzy) == 2


def test_fuzzy_empty_query():
    oracle = BM25Oracle([(1, "a b c")])
    assert fuzzy_search(oracle, "", k=10) == []


@pytest.fixture(scope="module")
def engine(spark, corpus):
    pages = spark.createDataFrame(corpus.to_pandas())
    prepared = prepare_pages(pages)
    tokens = tokenize_docs(prepared).cache()
    n_docs = corpus.num_rows
    avgdl = avgdl_of(tokens, n_docs)
    return tokens, n_docs, avgdl


@pytest.fixture(scope="module")
def oracle(corpus):
    import pandas as pd

    urls = pd.Series(corpus.column("url").to_pylist())
    ids = sha1_doc_id(urls)
    texts = corpus.column("text").to_pylist()
    return BM25Oracle(zip(ids.tolist(), texts))


@pytest.mark.parametrize("mode", ["and", "or"])
def test_spark_fuzzy_rank_identical(engine, oracle, queries, mode):
    tokens, n_docs, avgdl = engine
    batch = [(q["query_id"], q["query"], 10) for q in queries[:12]]
    got = bm25_fuzzy_scan_batch(tokens, batch, n_docs, avgdl, mode=mode)
    by_qid: dict[int, list] = {}
    for r in got.collect():
        by_qid.setdefault(r["query_id"], []).append(r)
    for qid, text, k in batch:
        exp = fuzzy_search(oracle, text, k=k, mode=mode)
        rows = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [d for d, _ in exp], (
            f"doc order mismatch q{qid} mode={mode}"
        )
        for r, (_, s) in zip(rows, exp):
            assert r["score"] == pytest.approx(s, rel=1e-9)


def test_spark_fuzzy_typo_query_recovers_docs(engine, oracle):
    """A deliberately typo'd query still retrieves via expansion."""
    tokens, n_docs, avgdl = engine
    # pick a real corpus term and typo it
    term = max(oracle.postings, key=lambda t: (len(t) >= 6, oracle.df(t)))
    typo = term[:-1] + ("x" if term[-1] != "x" else "y")
    got = bm25_fuzzy_scan_batch(tokens, [(0, typo, 10)], n_docs, avgdl)
    exp = fuzzy_search(oracle, typo, k=10)
    assert [r["doc_id"] for r in got.collect()] == [d for d, _ in exp]
    assert exp, "typo expansion found no docs — fixture term choice broken"


@pytest.fixture(scope="module")
def fuzzy_index(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index

    d = str(tmp_path_factory.mktemp("fuzzy_idx"))
    pages = spark.createDataFrame(corpus.to_pandas())
    build_index(pages, d, n_shards=4, n_tbuckets=8)
    return d


@pytest.mark.parametrize("mode", ["and", "or"])
def test_index_fuzzy_rank_identical(spark, fuzzy_index, oracle, queries, mode):
    from sparkfts.query import bm25_index_fuzzy_batch

    batch = [(q["query_id"], q["query"], 10) for q in queries[:8]]
    got = bm25_index_fuzzy_batch(spark, fuzzy_index, batch, mode=mode)
    by_qid: dict[int, list] = {}
    for r in got.collect():
        by_qid.setdefault(r["query_id"], []).append(r)
    for qid, text, k in batch:
        exp = fuzzy_search(oracle, text, k=k, mode=mode)
        rows = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [d for d, _ in exp], (
            f"doc order mismatch q{qid} mode={mode}"
        )
        for r, (_, s) in zip(rows, exp):
            assert r["score"] == pytest.approx(s, rel=1e-9)


def test_index_fuzzy_typo_query(spark, fuzzy_index, oracle):
    from sparkfts.query import bm25_index_fuzzy_batch

    term = max(oracle.postings, key=lambda t: (len(t) >= 6, oracle.df(t)))
    typo = term[:-1] + ("x" if term[-1] != "x" else "y")
    got = bm25_index_fuzzy_batch(spark, fuzzy_index, [(0, typo, 10)]).collect()
    exp = fuzzy_search(oracle, typo, k=10)
    assert exp, "fixture term choice produced no fuzzy hits"
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]


def test_searcher_fuzzy_rows_rank_identical(spark, fuzzy_index, oracle, queries):
    """Fuzzy serving path (driver dictionary + cached postings) matches
    the oracle and the distributed fuzzy plan, and is fast when warm."""
    import time

    from sparkfts.searcher import Searcher

    s = Searcher(spark, fuzzy_index)
    try:
        batch = [(q["query_id"], q["query"], 10) for q in queries[:6]]
        got = s.fuzzy_search_rows(batch)
        by_qid: dict[int, list] = {}
        for r in got:
            by_qid.setdefault(r[0], []).append(r)
        for qid, text, k in batch:
            exp = fuzzy_search(oracle, text, k=k)
            rows = by_qid.get(qid, [])
            assert [r[2] for r in rows] == [d for d, _ in exp], f"q{qid}"
            for r, (_, sc) in zip(rows, exp):
                assert r[3] == pytest.approx(sc, rel=1e-9)
        # typo'd query via serving path
        term = max(oracle.postings, key=lambda t: (len(t) >= 6, oracle.df(t)))
        typo = term[:-1] + ("x" if term[-1] != "x" else "y")
        got = s.fuzzy_search_rows([(0, typo, 10)])
        exp = fuzzy_search(oracle, typo, k=10)
        assert [r[2] for r in got] == [d for d, _ in exp]
        # warm repeats skip Spark entirely
        t0 = time.time()
        for _ in range(5):
            s.fuzzy_search_rows([(0, typo, 10)])
        per = (time.time() - t0) / 5
        assert per < 0.4, f"warm fuzzy took {per:.4f}s"
    finally:
        s.close()
