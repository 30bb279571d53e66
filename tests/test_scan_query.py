"""Rank-identity of the scan-mode engine vs the pure-Python oracle.

This is the driver's core check (SURVEY.md §5.3 item 2): over the
deterministic synthetic corpus and the full 50-query reference set, the
engine's top-k docIDs must equal the oracle's exactly, and scores must
match to <=1e-9 relative (in practice bit-for-bit, since summation order
is pinned on both sides).
"""

from __future__ import annotations

import pytest

from oracle.bm25 import BM25Oracle
from sparkfts.stats import avgdl_of
from sparkfts.synth import gen_corpus
from sparkfts.tokens import prepare_pages, sha1_doc_id, tokenize_docs
from sparkfts.query import bm25_scan, bm25_scan_batch


@pytest.fixture(scope="module")
def engine(spark, corpus):
    pages = spark.createDataFrame(corpus.to_pandas())
    prepared = prepare_pages(pages, validate_extraction=True)
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


def _check(expected, got_rows):
    got = [(r["doc_id"], r["score"]) for r in got_rows]
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (_, se), (_, sg) in zip(expected, got):
        assert sg == pytest.approx(se, rel=1e-9, abs=1e-12)


def test_rank_identity_all_queries(engine, oracle, queries):
    tokens, n_docs, avgdl = engine
    assert oracle.avgdl == avgdl  # identical float on both sides
    res = bm25_scan_batch(
        tokens, [(q["query_id"], q["query"], q["k"]) for q in queries],
        n_docs, avgdl,
    ).collect()
    by_qid: dict[int, list] = {}
    for r in res:
        by_qid.setdefault(r["query_id"], []).append(r)
    n_bitwise = 0
    for q in queries:
        expected = oracle.search(q["query"], k=q["k"])
        got = sorted(by_qid.get(q["query_id"], []), key=lambda r: r["rank"])
        _check(expected, got)
        n_bitwise += sum(
            1 for (d, s), r in zip(expected, got) if s == r["score"]
        )
    assert n_bitwise > 0  # pinned summation order should give exact floats


def test_rank_identity_or_mode(engine, oracle, queries):
    tokens, n_docs, avgdl = engine
    qs = [q for q in queries if q["query_id"] < 12]
    res = bm25_scan_batch(
        tokens, [(q["query_id"], q["query"], q["k"]) for q in qs],
        n_docs, avgdl, mode="or",
    ).collect()
    by_qid: dict[int, list] = {}
    for r in res:
        by_qid.setdefault(r["query_id"], []).append(r)
    for q in qs:
        expected = oracle.search(q["query"], k=q["k"], mode="or")
        got = sorted(by_qid.get(q["query_id"], []), key=lambda r: r["rank"])
        _check(expected, got)


def test_single_query_wrapper(engine, oracle):
    tokens, n_docs, avgdl = engine
    rows = bm25_scan(tokens, "the", 5, n_docs, avgdl).collect()
    expected = oracle.search("the", k=5)
    _check(expected, rows)
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]


def test_empty_query_and_no_hits(engine, spark):
    tokens, n_docs, avgdl = engine
    assert bm25_scan(tokens, "", 10, n_docs, avgdl).count() == 0
    assert bm25_scan(tokens, "zzqqxxnotaword", 10, n_docs, avgdl).count() == 0


def test_tokenize_docs_matches_pure(spark):
    from sparkfts.analysis import tokenize

    pdf = gen_corpus(30, seed=9).to_pandas()[["url", "text"]]
    pdf["doc_id"] = range(30)
    df = spark.createDataFrame(pdf)
    rows = tokenize_docs(df).collect()
    from collections import Counter

    for i, text in enumerate(pdf["text"]):
        toks = tokenize(text)
        mine = {r["term"]: r["tf"] for r in rows if r["doc_id"] == i}
        assert mine == dict(Counter(toks))
        dls = {r["doclen"] for r in rows if r["doc_id"] == i}
        assert dls == ({len(toks)} if toks else set())


def test_min_should_match_semantics(spark, corpus):
    """ES minimum_should_match: scan and index paths agree; results nest
    monotonically (msm=1 >= msm=2 >= msm=3 == AND); every hit contains
    >= msm distinct query terms."""
    import pytest as _pytest

    from sparkfts.analysis import tokenize, tokenize_query
    from sparkfts.index import build_index
    from sparkfts.query import bm25_index_batch, bm25_scan_batch
    from sparkfts.stats import avgdl_of
    from sparkfts.tokens import prepare_pages, tokenize_docs

    pages = spark.createDataFrame(corpus.to_pandas())
    prepared = prepare_pages(pages)
    tokens = tokenize_docs(prepared)
    n_docs = corpus.num_rows
    avgdl = avgdl_of(tokens, n_docs)

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        build_index(pages, d, n_shards=4, n_tbuckets=8)
        # pick 3 real corpus terms so every msm level has hits
        from collections import Counter

        cnt = Counter(
            t for txt in corpus.column("text").to_pylist()[:50]
            for t in set(tokenize(txt))
        )
        q = " ".join(t for t, _ in cnt.most_common(3))
        terms = set(tokenize_query(q))
        text_of = {}
        for r in prepared.select("doc_id", "text").collect():
            text_of[r["doc_id"]] = r["text"]

        prev_docs = None
        for msm in (1, 2, 3):
            via_scan = bm25_scan_batch(
                tokens, [(0, q, 400)], n_docs, avgdl, mode="or",
                min_should_match=msm,
            ).collect()
            via_index = bm25_index_batch(
                spark, d, [(0, q, 400)], mode="or", min_should_match=msm
            ).collect()
            assert [(r["rank"], r["doc_id"]) for r in via_scan] == [
                (r["rank"], r["doc_id"]) for r in via_index
            ], f"msm={msm} scan/index divergence"
            for a, b in zip(via_scan, via_index):
                assert a["score"] == _pytest.approx(b["score"], rel=1e-9)
            docs = {r["doc_id"] for r in via_index}
            for did in docs:
                n_present = len(terms & set(tokenize(text_of[did])))
                assert n_present >= msm, (did, msm, n_present)
            if prev_docs is not None:
                assert docs <= prev_docs, f"msm={msm} not nested"
            prev_docs = docs
        # msm == n_terms is exactly conjunctive
        conj = {r["doc_id"] for r in bm25_index_batch(
            spark, d, [(0, q, 400)], mode="and").collect()}
        assert prev_docs == conj


def test_explain_score_sums_to_result(spark, tmp_path, corpus):
    """_explain: per-term contributions sum exactly to the doc's score
    from the query path; non-matching conjunctive doc -> empty."""
    from sparkfts.index import build_index
    from sparkfts.query import bm25_index_batch, explain_score
    from sparkfts.analysis import tokenize

    idx = str(tmp_path / "explain_idx")
    pdf = corpus.to_pandas()
    build_index(spark.createDataFrame(pdf), idx, n_shards=4, n_tbuckets=8)
    toks = tokenize(pdf.iloc[0]["text"])
    q = " ".join(toks[:2])
    top = bm25_index_batch(spark, idx, [(0, q, 5)], mode="and").collect()
    assert top
    doc = top[0]["doc_id"]
    rows = explain_score(spark, idx, q, doc, mode="and").collect()
    assert {r["term"] for r in rows} == set(tokenize(q))
    import pytest as _pt

    assert sum(r["contribution"] for r in rows) == _pt.approx(
        top[0]["score"], rel=1e-12
    )
    # a doc that lacks a term explains to empty under AND
    import pandas as pd
    from sparkfts.tokens import sha1_doc_id

    ids = sha1_doc_id(pdf["url"])
    missing = next(
        int(ids[i]) for i, t in enumerate(pdf["text"])
        if not set(tokenize(q)) <= set(tokenize(t))
    )
    assert explain_score(spark, idx, q, missing, mode="and").collect() == []


# ---- ES pinned query ----


def test_pinned_query(spark, pages_df, queries, tmp_path_factory):
    from sparkfts.index import build_index
    from sparkfts.query import bm25_index_batch, pinned_topk_batch

    index_dir = str(tmp_path_factory.mktemp("pinned_idx"))
    build_index(pages_df, index_dir, n_shards=2, n_tbuckets=4)
    q = queries[0]["query"]
    organic = bm25_index_batch(
        spark, index_dir, [(0, q, 10)], mode="or"
    ).collect()
    organic_ids = [r["doc_id"] for r in organic]
    assert len(organic_ids) >= 4
    # pin: one non-matching id (fabricated) + one deep organic doc
    pin = [999_999_999_999, organic_ids[3]]
    got = pinned_topk_batch(
        spark, index_dir, [(0, q, 10)], {0: pin}, mode="or"
    ).collect()
    ids = [r["doc_id"] for r in got]
    assert ids[:2] == pin  # pinned order, incl. the non-matching doc
    # organic tail = original ranking minus pinned docs
    rest = [d for d in organic_ids if d not in pin]
    assert ids[2:] == rest[: len(ids) - 2]
    # pinned scores strictly above any organic score and descending
    assert got[0]["score"] > got[1]["score"] > got[2]["score"]
    ranks = [r["rank"] for r in got]
    assert ranks == list(range(1, len(got) + 1))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pinned_topk_batch(spark, index_dir, [(0, q, 10)],
                          {0: [1, 1]})
    # no pins for a query -> plain organic ranking
    plain = pinned_topk_batch(
        spark, index_dir, [(0, q, 10)], {}, mode="or"
    ).collect()
    assert [r["doc_id"] for r in plain] == organic_ids
