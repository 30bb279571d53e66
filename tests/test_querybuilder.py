"""Query-builder parity (reference ElasticsearchToNeo4jSync.py:61-107).

Covers: cloud-event parsing with subject allow-list + lowercasing, the
empty-query -> match-all rule, None on malformed events, equalizeListValues
config canonicalization, and end-to-end bool.must execution vs an oracle
composition.
"""

from __future__ import annotations

import pytest

from oracle.bm25 import BM25Oracle
from oracle.fuzzy import fuzzy_search
from sparkfts.querybuilder import (
    Clause,
    SearchRequest,
    build_search_request,
    equalize_list_values,
    match_all_topk,
    run_search_request,
)
from sparkfts.stats import avgdl_of
from sparkfts.tokens import prepare_pages, sha1_doc_id, tokenize_docs

EVENT = {
    "searchQueries": [
        {
            "properties": [
                {"subject": "name", "value": "Tom HANKS"},
                {"subject": "age", "value": "42"},  # not in allow-list
            ]
        },
        {"properties": [{"subject": "name", "value": "Rita Wilson"}]},
    ]
}


def test_build_request_filters_and_lowercases():
    req = build_search_request(EVENT)
    assert req is not None and len(req.clauses) == 2
    assert req.clauses[0].query == "tom hanks"  # lowercased (ref :94)
    assert req.clauses[1].query == "rita wilson"
    assert req.clauses[0].operator == "and"  # ref :96
    assert req.clauses[0].fuzziness == "AUTO"  # ref :97
    assert req.k == 10  # ES default size (ref ElasticsearchHandler.py:52-74)


def test_build_request_empty_is_match_all():
    req = build_search_request({"searchQueries": []})
    assert req is not None and req.is_match_all
    # all subjects filtered out -> also match-all (ref :100,102)
    req2 = build_search_request(
        {"searchQueries": [{"properties": [{"subject": "zzz", "value": "v"}]}]}
    )
    assert req2 is not None and req2.is_match_all


def test_build_request_malformed_returns_none():
    assert build_search_request({}) is None  # ref :103-105
    assert build_search_request({"searchQueries": [{"nope": 1}]}) is None
    assert build_search_request({"searchQueries": 7}) is None


def test_equalize_list_values():
    # parity with reference :61-71 — pad shorter lists with first element
    out = equalize_list_values({"a": [1, 2, 3], "b": [9], "c": "scalar"})
    assert out == {"a": [1, 2, 3], "b": [9, 9, 9], "c": "scalar"}
    assert equalize_list_values({"x": "y"}) == {"x": "y"}
    out2 = equalize_list_values({"a": [], "b": [1, 2]})
    assert out2["a"] == [] and out2["b"] == [1, 2]  # empty list can't pad


@pytest.fixture(scope="module")
def engine(spark, corpus):
    pages = spark.createDataFrame(corpus.to_pandas())
    prepared = prepare_pages(pages)
    docs = prepared.select("doc_id").cache()
    tokens = tokenize_docs(prepared).cache()
    return tokens, docs, corpus.num_rows, avgdl_of(tokens, corpus.num_rows)


@pytest.fixture(scope="module")
def oracle(corpus):
    import pandas as pd

    ids = sha1_doc_id(pd.Series(corpus.column("url").to_pylist()))
    return BM25Oracle(zip(ids.tolist(), corpus.column("text").to_pylist()))


def test_match_all_topk(engine, oracle):
    _, docs, n_docs, _ = engine
    rows = match_all_topk(docs, k=5).collect()
    exp = sorted(oracle.doclen)[:5]
    assert [r["doc_id"] for r in rows] == exp
    assert all(r["score"] == 1.0 for r in rows)
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]


def _oracle_must(oracle: BM25Oracle, clauses: list[str], k: int):
    """bool.must composition: every clause matches; scores sum per clause."""
    per = [dict(fuzzy_search(oracle, c, k=oracle.n_docs)) for c in clauses]
    common = set(per[0])
    for p in per[1:]:
        common &= set(p)
    scored = []
    for d in sorted(common):
        s = 0.0
        for p in per:  # clause-index order, matches engine fold
            s += p[d]
        scored.append((d, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def test_run_search_request_must_semantics(engine, oracle, queries):
    tokens, docs, n_docs, avgdl = engine
    c1, c2 = queries[0]["query"], queries[1]["query"]
    req = SearchRequest(clauses=(Clause(query=c1), Clause(query=c2)), k=10)
    got = run_search_request(tokens, docs, req, n_docs, avgdl).collect()
    exp = _oracle_must(oracle, [c1, c2], k=10)
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_run_search_request_match_all(engine):
    tokens, docs, n_docs, avgdl = engine
    req = SearchRequest(clauses=(), k=3)
    rows = run_search_request(tokens, docs, req, n_docs, avgdl).collect()
    assert len(rows) == 3 and all(r["score"] == 1.0 for r in rows)


@pytest.fixture(scope="module")
def qb_index(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index

    d = str(tmp_path_factory.mktemp("qb_idx"))
    pages = spark.createDataFrame(corpus.to_pandas())
    build_index(pages, d, n_shards=4, n_tbuckets=8)
    return d


def test_run_search_request_indexed_matches_scan(
    spark, engine, qb_index, queries
):
    """Index-backed SearchRequest execution == the scan baseline, for
    multi-clause must and for match-all."""
    from sparkfts.querybuilder import run_search_request_indexed

    tokens, docs, n_docs, avgdl = engine
    c1, c2 = queries[0]["query"], queries[1]["query"]
    req = SearchRequest(clauses=(Clause(query=c1), Clause(query=c2)), k=10)
    scan = run_search_request(tokens, docs, req, n_docs, avgdl).collect()
    idx = run_search_request_indexed(spark, qb_index, req).collect()
    assert [(r["rank"], r["doc_id"]) for r in idx] == [
        (r["rank"], r["doc_id"]) for r in scan
    ]
    for a, b in zip(idx, scan):
        assert a["score"] == pytest.approx(b["score"], rel=1e-9)

    ma = run_search_request_indexed(
        spark, qb_index, SearchRequest(clauses=(), k=4)
    ).collect()
    exp_ma = run_search_request(
        tokens, docs, SearchRequest(clauses=(), k=4), n_docs, avgdl
    ).collect()
    assert [r["doc_id"] for r in ma] == [r["doc_id"] for r in exp_ma]


def test_run_search_request_indexed_multifield(
    spark, corpus, queries, tmp_path_factory
):
    """Clause field lists are honored on a multi-field index; single-field
    'text' clauses reproduce the single-field answer."""
    from pyspark.sql import functions as F

    from sparkfts.multifield import build_multifield_index
    from sparkfts.querybuilder import run_search_request_indexed

    d = str(tmp_path_factory.mktemp("qb_mf_idx"))
    pages = spark.createDataFrame(corpus.to_pandas())
    toks = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    pages = pages.withColumn("title", F.array_join(F.slice(toks, 1, 8), " "))
    build_multifield_index(
        pages, d, fields=("title", "text"), n_shards=4, n_tbuckets=8
    )
    c = queries[0]["query"]
    req_tx = SearchRequest(
        clauses=(Clause(query=c, fields=("text",)),), k=10
    )
    got = run_search_request_indexed(spark, d, req_tx, multifield=True)
    # the text-only clause must equal a plain single-field fuzzy query
    from sparkfts.multifield import field_dir
    from sparkfts.query import bm25_index_fuzzy_batch

    exp = bm25_index_fuzzy_batch(
        spark, field_dir(d, "text"), [(0, c, 10)]
    ).collect()
    assert [r["doc_id"] for r in got.collect()] == [r["doc_id"] for r in exp]

    # a multi-field clause runs best-fields and returns a valid page
    req_mf = SearchRequest(
        clauses=(Clause(query=c, fields=("title^2", "text")),), k=10
    )
    rows = run_search_request_indexed(spark, d, req_mf, multifield=True)
    assert rows.collect(), "multi-field clause returned nothing"


def test_should_clauses_add_score(spark, pages_df, corpus, tmp_path):
    """bool.should: matching should clauses ADD score to must matches;
    non-matching leave it unchanged; scan and indexed paths agree."""
    import pandas as pd

    from sparkfts.index import build_index
    from sparkfts.querybuilder import (
        Clause,
        SearchRequest,
        run_search_request,
        run_search_request_indexed,
    )
    from sparkfts.stats import avgdl_of
    from sparkfts.tokens import tokenize_docs, prepare_pages
    from sparkfts.analysis import tokenize

    idx = str(tmp_path / "should_idx")
    build_index(pages_df, idx, n_shards=4, n_tbuckets=8)
    prepared = prepare_pages(pages_df)
    tokens = tokenize_docs(prepared)
    n_docs = pages_df.count()
    avgdl = avgdl_of(tokens, n_docs)

    texts = corpus.column("text").to_pylist()
    t_must = tokenize(texts[0])[0]
    t_should = tokenize(texts[1])[2]
    base = SearchRequest(clauses=(Clause(query=t_must),), k=10_000)
    with_should = SearchRequest(
        clauses=(Clause(query=t_must),),
        should=(Clause(query=t_should),),
        k=10_000,
    )
    docs = prepared.select("doc_id")
    plain = {r["doc_id"]: r["score"]
             for r in run_search_request(tokens, docs, base, n_docs,
                                         avgdl).collect()}
    sh = {r["doc_id"]: r["score"]
          for r in run_search_request(tokens, docs, with_should, n_docs,
                                      avgdl).collect()}
    assert set(plain) == set(sh)  # should never changes the match set
    assert any(sh[d] > plain[d] for d in plain)       # some got the bonus
    assert any(sh[d] == plain[d] for d in plain)      # some did not

    # indexed path identical to scan path
    idx_rows = {r["doc_id"]: r["score"]
                for r in run_search_request_indexed(
                    spark, idx, with_should).collect()}
    exp_order = sorted(sh.items(), key=lambda kv: (-kv[1], kv[0]))
    got_order = sorted(idx_rows.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [d for d, _ in exp_order] == [d for d, _ in got_order]
    for (d, s), (_, gs) in zip(exp_order, got_order):
        assert gs == pytest.approx(s, rel=1e-9), d


def test_pure_should_minimum_one(spark, pages_df, corpus, tmp_path):
    """No must clauses + should clauses: docs must match >= 1 should."""
    from sparkfts.index import build_index
    from sparkfts.querybuilder import (
        Clause,
        SearchRequest,
        run_search_request_indexed,
    )
    from sparkfts.analysis import tokenize

    idx = str(tmp_path / "pure_should_idx")
    build_index(pages_df, idx, n_shards=4, n_tbuckets=8)
    texts = corpus.column("text").to_pylist()
    t1, t2 = tokenize(texts[0])[0], tokenize(texts[1])[2]
    req = SearchRequest(
        clauses=(), should=(Clause(query=t1), Clause(query=t2)), k=10_000
    )
    rows = run_search_request_indexed(spark, idx, req).collect()
    assert rows
    got = {r["doc_id"] for r in rows}
    # every returned doc contains t1 or t2 (fuzzy-AND per clause means
    # at least the clause's own expansion set matched)
    from sparkfts.query import bm25_index_fuzzy_batch

    m1 = {r["doc_id"] for r in bm25_index_fuzzy_batch(
        spark, idx, [(0, t1, 10_000)]).collect()}
    m2 = {r["doc_id"] for r in bm25_index_fuzzy_batch(
        spark, idx, [(0, t2, 10_000)]).collect()}
    assert got == (m1 | m2)
