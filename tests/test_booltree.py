"""Single-pass bool-tree kernel (sparkfts.booltree).

Pins: (a) full-request parity with the scan-path composition baseline
(must + should + must_not + filter in ONE kernel pass); (b) the plan
bound — the global window sees <= n_shards * k rows per request, never
a complete match set; (c) nested Bool grammar; (d) exact-fuzziness
clauses reproduce the exact conjunctive scorer; (e) multi-request
batches with differing filters.
"""

from __future__ import annotations

import os

import pytest

from sparkfts.analysis import tokenize
from sparkfts.querybuilder import Bool, Clause, SearchRequest


@pytest.fixture(scope="module")
def bt_index(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index

    d = str(tmp_path_factory.mktemp("bt_idx"))
    pages = spark.createDataFrame(corpus.to_pandas())
    build_index(
        pages, d, n_shards=4, n_tbuckets=8, docvalue_cols=["lang"]
    )
    return d


@pytest.fixture(scope="module")
def bt_scan(spark, corpus):
    from sparkfts.stats import avgdl_of
    from sparkfts.tokens import prepare_pages, tokenize_docs

    pages = spark.createDataFrame(corpus.to_pandas())
    prepared = prepare_pages(pages)
    tokens = tokenize_docs(prepared).cache()
    n_docs = corpus.num_rows
    return tokens, prepared, n_docs, avgdl_of(tokens, n_docs)


def _clause_terms(corpus):
    texts = corpus.column("text").to_pylist()
    return tokenize(texts[0])[0], tokenize(texts[1])[2], tokenize(texts[2])[1]


def test_full_bool_request_matches_scan(spark, corpus, bt_index, bt_scan):
    """must + should + must_not together, single-pass vs scan baseline."""
    from sparkfts.querybuilder import (
        run_search_request,
        run_search_request_indexed,
    )

    tokens, prepared, n_docs, avgdl = bt_scan
    t1, t2, t3 = _clause_terms(corpus)
    req = SearchRequest(
        clauses=(Clause(query=t1),),
        should=(Clause(query=t2),),
        must_not=(t3,),
        k=10_000,
    )
    docs = prepared.select("doc_id", "lang") if "lang" in prepared.columns \
        else prepared.select("doc_id")
    scan = run_search_request(tokens, docs, req, n_docs, avgdl).collect()
    idx = run_search_request_indexed(spark, bt_index, req).collect()
    assert scan, "test premise: the request matches something"
    assert [(r["rank"], r["doc_id"]) for r in idx] == [
        (r["rank"], r["doc_id"]) for r in scan
    ]
    for a, b in zip(idx, scan):
        assert a["score"] == pytest.approx(b["score"], rel=1e-9)


def test_filtered_bool_request(spark, corpus, bt_index):
    """filter_expr restricts the match set without changing scores."""
    from sparkfts.booltree import bool_topk_batch

    t1, _, _ = _clause_terms(corpus)
    langs = {r[0] for r in corpus.to_pandas()[["lang"]].itertuples(index=False)}
    lang = sorted(langs)[0]
    plain = bool_topk_batch(
        spark, bt_index, [SearchRequest(clauses=(Clause(query=t1),), k=10_000)]
    ).collect()
    filt = bool_topk_batch(
        spark,
        bt_index,
        [
            SearchRequest(
                clauses=(Clause(query=t1),),
                filter_expr=f"lang = '{lang}'",
                k=10_000,
            )
        ],
    ).collect()
    assert plain and filt
    plain_scores = {r["doc_id"]: r["score"] for r in plain}
    from sparkfts.index import load_docmap

    allowed = {
        r["doc_id"]
        for r in load_docmap(spark, bt_index)
        .where(f"lang = '{lang}'")
        .select("doc_id")
        .collect()
    }
    assert {r["doc_id"] for r in filt} == set(plain_scores) & allowed
    for r in filt:  # ES: filter never changes scoring stats
        assert r["score"] == pytest.approx(plain_scores[r["doc_id"]], rel=1e-12)


def test_local_stage_bounded_by_shards_times_k(spark, corpus, bt_index):
    """The global window input carries <= n_shards * k rows per request
    even when the match set is far larger (no full-match-set plan)."""
    from sparkfts.booltree import bool_local, bool_topk_batch
    from sparkfts.index import read_meta

    t1, t2, _ = _clause_terms(corpus)
    k = 3
    req = SearchRequest(
        clauses=(Clause(query=t1),), should=(Clause(query=t2),), k=k
    )
    n_shards = read_meta(bt_index)["n_shards"]
    full = bool_topk_batch(
        spark, bt_index, [SearchRequest(clauses=(Clause(query=t1),),
                                        should=(Clause(query=t2),),
                                        k=10_000)]
    ).collect()
    assert len(full) > n_shards * k, "test premise: many matches"
    local = bool_local(spark, bt_index, [req])
    assert local.count() <= n_shards * k
    # and the page itself is exact: equals the top-k of the full run
    page = bool_topk_batch(spark, bt_index, [req]).collect()
    assert [(r["doc_id"], r["score"]) for r in page] == [
        (r["doc_id"], r["score"]) for r in full[:k]
    ]


def test_nested_bool_grammar(spark, corpus, bt_index):
    """must = [Clause(a), Bool(should=[b, c])]: doc must match a AND
    (b OR c); score = score_a + (b+c bonus over matches)."""
    from sparkfts.booltree import bool_topk_batch
    from sparkfts.query import bm25_index_fuzzy_batch

    t1, t2, t3 = _clause_terms(corpus)
    req = SearchRequest(
        clauses=(
            Clause(query=t1),
            Bool(should=(Clause(query=t2), Clause(query=t3))),
        ),
        k=10_000,
    )
    got = bool_topk_batch(spark, bt_index, [req]).collect()

    def matches(term):
        return {
            r["doc_id"]: r["score"]
            for r in bm25_index_fuzzy_batch(
                spark, bt_index, [(0, term, 10_000)]
            ).collect()
        }

    m1, m2, m3 = matches(t1), matches(t2), matches(t3)
    exp = {}
    for d, s in m1.items():
        if d in m2 or d in m3:
            exp[d] = s + m2.get(d, 0.0) + m3.get(d, 0.0)
    assert {r["doc_id"] for r in got} == set(exp)
    for r in got:
        assert r["score"] == pytest.approx(exp[r["doc_id"]], rel=1e-9)

    # nested must_not: exclude docs matching (b AND c)
    req2 = SearchRequest(
        clauses=(Clause(query=t1),),
        must_not=(),
        k=10_000,
    )
    base = {r["doc_id"] for r in bool_topk_batch(
        spark, bt_index, [req2]).collect()}
    req3 = SearchRequest(
        clauses=(
            Clause(query=t1),
            Bool(must_not=(Bool(must=(Clause(query=t2),
                                      Clause(query=t3))),),
                 should=(Clause(query=t1),)),
        ),
        k=10_000,
    )
    got3 = {r["doc_id"] for r in bool_topk_batch(
        spark, bt_index, [req3]).collect()}
    both = {d for d in m2 if d in m3}
    assert got3 == base - both


def test_exact_fuzziness_clause(spark, corpus, bt_index):
    """fuzziness='0' pins exact matching == the exact conjunctive path."""
    from sparkfts.booltree import bool_topk_batch
    from sparkfts.query import bm25_index_batch

    t1, t2, _ = _clause_terms(corpus)
    q = f"{t1} {t2}"
    req = SearchRequest(clauses=(Clause(query=q, fuzziness="0"),), k=25)
    got = bool_topk_batch(spark, bt_index, [req]).collect()
    exp = bm25_index_batch(spark, bt_index, [(0, q, 25)]).collect()
    assert [(r["doc_id"]) for r in got] == [(r["doc_id"]) for r in exp]
    for a, b in zip(got, exp):
        assert a["score"] == pytest.approx(b["score"], rel=1e-12)


def test_multi_request_batch_with_mixed_filters(spark, corpus, bt_index):
    """A batch mixing filtered and unfiltered requests runs in one plan
    and each request's page equals its solo run."""
    from sparkfts.booltree import bool_topk_batch

    t1, t2, _ = _clause_terms(corpus)
    langs = sorted(
        {r[0] for r in corpus.to_pandas()[["lang"]].itertuples(index=False)}
    )
    reqs = [
        SearchRequest(clauses=(Clause(query=t1),), k=5),
        SearchRequest(
            clauses=(Clause(query=t1),),
            filter_expr=f"lang = '{langs[0]}'",
            k=5,
        ),
        SearchRequest(clauses=(Clause(query=t2),), should=(Clause(query=t1),),
                      k=5),
    ]
    batched = bool_topk_batch(spark, bt_index, reqs).collect()
    for rid, req in enumerate(reqs):
        solo = bool_topk_batch(spark, bt_index, [req]).collect()
        got = [r for r in batched if r["request_id"] == rid]
        assert [(r["rank"], r["doc_id"], r["score"]) for r in got] == [
            (r["rank"], r["doc_id"], r["score"]) for r in solo
        ], f"request {rid}"


def test_clause_operator_or_honored(spark, corpus, bt_index, bt_scan):
    """A clause with operator='or' runs disjunctively on every path
    (the round-4 ADVICE single-field regression)."""
    from sparkfts.querybuilder import (
        run_search_request,
        run_search_request_indexed,
    )

    tokens, prepared, n_docs, avgdl = bt_scan
    t1, t2, _ = _clause_terms(corpus)
    req = SearchRequest(
        clauses=(Clause(query=f"{t1} {t2}", operator="or"),), k=10_000
    )
    docs = prepared.select("doc_id")
    scan = run_search_request(tokens, docs, req, n_docs, avgdl).collect()
    idx = run_search_request_indexed(spark, bt_index, req).collect()
    assert scan and idx
    # OR must be a strict superset of AND's match set here
    and_req = SearchRequest(clauses=(Clause(query=f"{t1} {t2}"),), k=10_000)
    and_rows = run_search_request_indexed(spark, bt_index, and_req).collect()
    assert len(idx) > len(and_rows)
    assert [(r["rank"], r["doc_id"]) for r in idx] == [
        (r["rank"], r["doc_id"]) for r in scan
    ]
    for a, b in zip(idx, scan):
        assert a["score"] == pytest.approx(b["score"], rel=1e-9)


def test_multifield_bool_single_pass(spark, corpus, tmp_path_factory):
    """Multi-field requests run through the single-pass kernel with
    best-fields clause combination == the composed per-clause ground
    truth (must sum + should bonus + must_not exclusion)."""
    from pyspark.sql import functions as F

    from sparkfts.booltree import bool_topk_batch
    from sparkfts.multifield import (
        bm25_multifield_fuzzy_batch,
        build_multifield_index,
    )

    d = str(tmp_path_factory.mktemp("bt_mf_idx"))
    pages = spark.createDataFrame(corpus.to_pandas())
    toks = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    pages = pages.withColumn("title", F.array_join(F.slice(toks, 1, 8), " "))
    build_multifield_index(
        pages, d, fields=("title", "text"), n_shards=4, n_tbuckets=8
    )
    t1, t2, t3 = _clause_terms(corpus)
    flds = ("title^2", "text")
    req = SearchRequest(
        clauses=(Clause(query=t1, fields=flds),),
        should=(Clause(query=t2, fields=flds),),
        must_not=(t3,),
        k=10_000,
    )
    got = bool_topk_batch(spark, d, [req], multifield=True).collect()

    def clause_scores(term):
        return {
            r["doc_id"]: r["score"]
            for r in bm25_multifield_fuzzy_batch(
                spark, d, [(0, term, 10_000)], fields=list(flds)
            ).collect()
        }

    m1, m2 = clause_scores(t1), clause_scores(t2)
    from sparkfts.aggs import match_docs_batch
    from sparkfts.multifield import field_dir

    excl = set()
    for fld in ("title", "text"):
        excl |= {
            r["doc_id"]
            for r in match_docs_batch(
                spark, field_dir(d, fld), [(0, t3)], mode="or"
            ).collect()
        }
    exp = {
        doc: s + m2.get(doc, 0.0)
        for doc, s in m1.items()
        if doc not in excl
    }
    assert exp, "test premise"
    assert {r["doc_id"] for r in got} == set(exp)
    for r in got:
        assert r["score"] == pytest.approx(exp[r["doc_id"]], rel=1e-9)
