"""Multi-field best-fields BM25 (SURVEY.md §2 gap #1 from round-1 VERDICT).

Pins ES ``multi_match(type=best_fields, operator=and, tie_breaker=0)`` —
the reference's actual query shape (fields list at reference
ElasticsearchToNeo4jSync.py:89 feeding multi_match :92-99) — and asserts
the index path, the scan path, the serving path and a pure-Python
per-field oracle all agree rank-identically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle.bm25 import BM25Oracle
from sparkfts.multifield import (
    MultiFieldSearcher,
    bm25_multifield_batch,
    bm25_multifield_scan_batch,
    build_multifield_index,
    parse_field_boosts,
)

FIELDS = ["title^2", "text"]


def test_parse_field_boosts():
    assert parse_field_boosts(["title^2", "text"]) == [
        ("title", 2.0),
        ("text", 1.0),
    ]
    assert parse_field_boosts(["a^0.5"]) == [("a", 0.5)]


@pytest.fixture(scope="module")
def mf_pages(spark, corpus):
    """Webtext pages + a synthesized `title` field (first 8 tokens)."""
    pages = spark.createDataFrame(corpus.to_pandas())
    toks = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    return pages.withColumn("title", F.array_join(F.slice(toks, 1, 8), " "))


@pytest.fixture(scope="module")
def mf_index(mf_pages, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mf_idx"))
    build_multifield_index(
        mf_pages, d, fields=("title", "text"), n_shards=4, n_tbuckets=8
    )
    return d


@pytest.fixture(scope="module")
def py_oracles(mf_pages):
    """Per-field BM25Oracle over the same doc ids the index assigns."""
    rows = mf_pages.select("url", "title", "text").collect()
    import pandas as pd

    from sparkfts.tokens import sha1_doc_id

    ids = sha1_doc_id(pd.Series([r["url"] for r in rows])).tolist()
    return {
        "title": BM25Oracle(zip(ids, [r["title"] for r in rows])),
        "text": BM25Oracle(zip(ids, [r["text"] for r in rows])),
    }


def best_fields_expected(py_oracles, query, k, mode="and", offset=0):
    n = max(o.n_docs for o in py_oracles.values())
    best: dict[int, float] = {}
    for spec in FIELDS:
        fld, _, b = spec.partition("^")
        boost = float(b) if b else 1.0
        for doc_id, score in py_oracles[fld].search(query, k=n, mode=mode):
            s = score * boost
            if doc_id not in best or s > best[doc_id]:
                best[doc_id] = s
    ranked = sorted(best.items(), key=lambda e: (-e[1], e[0]))
    return ranked[offset : offset + k]


@pytest.mark.parametrize("mode", ["and", "or"])
def test_index_matches_python_best_fields(
    spark, mf_index, py_oracles, queries, mode
):
    batch = [(q["query_id"], q["query"], 10) for q in queries[:10]]
    got = bm25_multifield_batch(
        spark, mf_index, batch, fields=FIELDS, mode=mode
    )
    by_qid: dict[int, list] = {}
    for r in got.collect():
        by_qid.setdefault(r["query_id"], []).append(r)
    checked = 0
    for qid, text, k in batch:
        exp = best_fields_expected(py_oracles, text, k, mode=mode)
        rows = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [d for d, _ in exp], (
            f"doc order mismatch q{qid} mode={mode}"
        )
        for r, (_, s) in zip(rows, exp):
            assert r["score"] == pytest.approx(s, rel=1e-9)
        checked += bool(exp)
    assert checked >= 5, "fixture queries barely matched anything"


def test_scan_path_rank_identical_to_index(spark, mf_pages, mf_index, queries):
    batch = [(q["query_id"], q["query"], 10) for q in queries[:8]]
    via_index = bm25_multifield_batch(
        spark, mf_index, batch, fields=FIELDS
    ).collect()
    from sparkfts.tokens import prepare_pages

    docs = prepare_pages(mf_pages).join(
        mf_pages.select("url", "title"), "url"
    )
    via_scan = bm25_multifield_scan_batch(docs, FIELDS, batch).collect()
    assert [(r["query_id"], r["rank"], r["doc_id"]) for r in via_index] == [
        (r["query_id"], r["rank"], r["doc_id"]) for r in via_scan
    ]
    for a, b in zip(via_index, via_scan):
        assert a["score"] == pytest.approx(b["score"], rel=1e-9)


def test_title_boost_changes_winner(spark, mf_index, py_oracles, queries):
    """A title-heavy doc must outrank under title^2 when the unboosted
    order differs — proves the boost actually multiplies."""
    batch = [(0, queries[0]["query"], 10)]
    boosted = bm25_multifield_batch(
        spark, mf_index, batch, fields=["title^2", "text"]
    ).collect()
    plain = bm25_multifield_batch(
        spark, mf_index, batch, fields=["title", "text"]
    ).collect()
    exp_boosted = best_fields_expected(py_oracles, queries[0]["query"], 10)
    assert [r["doc_id"] for r in boosted] == [d for d, _ in exp_boosted]
    # boosted scores are exactly 2x where title wins the max
    for rb in boosted:
        pm = {r["doc_id"]: r["score"] for r in plain}
        if rb["doc_id"] in pm:
            assert rb["score"] == pytest.approx(
                max(pm[rb["doc_id"]], rb["score"]), rel=1e-9
            )


def test_multifield_offset_pagination(spark, mf_index, queries):
    q = queries[1]["query"]
    full = bm25_multifield_batch(
        spark, mf_index, [(0, q, 10)], fields=FIELDS
    ).collect()
    page2 = bm25_multifield_batch(
        spark, mf_index, [(0, q, 5)], fields=FIELDS, offset=5
    ).collect()
    assert [(r["rank"], r["doc_id"]) for r in page2] == [
        (r["rank"], r["doc_id"]) for r in full[5:10]
    ]


def test_multifield_searcher_matches_distributed(spark, mf_index, queries):
    batch = [(q["query_id"], q["query"], 10) for q in queries[:6]]
    dist = bm25_multifield_batch(spark, mf_index, batch, fields=FIELDS).collect()
    s = MultiFieldSearcher(spark, mf_index)
    try:
        rows = s.search_rows(batch, fields=FIELDS)
        assert [(r[0], r[1], r[2]) for r in rows] == [
            (r["query_id"], r["rank"], r["doc_id"]) for r in dist
        ]
        for r, d in zip(rows, dist):
            assert r[3] == pytest.approx(d["score"], rel=1e-9)
    finally:
        s.close()


def test_multifield_fuzzy_matches_per_field_oracle(
    spark, mf_index, py_oracles, queries
):
    """Fuzzy best-fields == max over per-field python fuzzy oracles."""
    from oracle.fuzzy import fuzzy_search

    from sparkfts.multifield import bm25_multifield_fuzzy_batch

    # typo a real term so expansion actually fires
    import re

    q0 = queries[0]["query"]
    words = q0.split()
    typo_q = " ".join(
        [words[0][:-1] + ("x" if words[0][-1] != "x" else "y")] + words[1:]
    )
    got = bm25_multifield_fuzzy_batch(
        spark, mf_index, [(0, typo_q, 10)], fields=FIELDS
    ).collect()

    best: dict[int, float] = {}
    for spec in FIELDS:
        fld, _, b = spec.partition("^")
        boost = float(b) if b else 1.0
        o = py_oracles[fld]
        for d, s in fuzzy_search(o, typo_q, k=o.n_docs):
            s *= boost
            if d not in best or s > best[d]:
                best[d] = s
    exp = sorted(best.items(), key=lambda e: (-e[1], e[0]))[:10]
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    import pytest as _pytest

    for r, (_, s) in zip(got, exp):
        assert r["score"] == _pytest.approx(s, rel=1e-9)
    assert exp, "typo query produced no fuzzy hits — fixture broken"


def test_tie_breaker_dis_max(spark, corpus, tmp_path_factory):
    """ES multi_match tie_breaker: combined = best + tb * sum(others);
    tb=0 equals the pure best-fields plan; tb>0 matches a per-field
    oracle composition (routed through the exact bool-tree kernel)."""
    import pandas as pd
    import pytest as _pytest
    from pyspark.sql import functions as F

    from oracle.bm25 import BM25Oracle
    from sparkfts.analysis import tokenize
    from sparkfts.multifield import (
        bm25_multifield_batch,
        build_multifield_index,
    )
    from sparkfts.tokens import sha1_doc_id

    d = str(tmp_path_factory.mktemp("tb_mf_idx"))
    pdf = corpus.to_pandas()
    pages = spark.createDataFrame(pdf)
    toks = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    pages = pages.withColumn("title", F.array_join(F.slice(toks, 1, 8), " "))
    build_multifield_index(
        pages, d, fields=("title", "text"), n_shards=4, n_tbuckets=8
    )
    ids = sha1_doc_id(pdf["url"])
    titles = [" ".join(tokenize(t)[:8]) for t in pdf["text"]]
    o_title = BM25Oracle(zip(ids.tolist(), titles))
    o_text = BM25Oracle(zip(ids.tolist(), pdf["text"].tolist()))

    q = tokenize(pdf.iloc[0]["text"])[0]
    flds = ["title^2", "text"]
    tb = 0.3
    got = bm25_multifield_batch(
        spark, d, [(0, q, 10_000)], fields=flds, tie_breaker=tb
    ).collect()
    # python composition: boosted per-field scores -> max + tb*(sum-max)
    per_doc: dict[int, list[float]] = {}
    for o, boost in ((o_title, 2.0), (o_text, 1.0)):
        for doc, s in o.search(q, k=o.n_docs, mode="and"):
            per_doc.setdefault(doc, []).append(s * boost)
    exp = {
        doc: max(ss) + tb * (sum(ss) - max(ss)) for doc, ss in per_doc.items()
    }
    assert exp, "test premise"
    assert {r["doc_id"] for r in got} == set(exp)
    for r in got:
        assert r["score"] == _pytest.approx(exp[r["doc_id"]], rel=1e-9)
    # ordering follows the combined score
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)

    # tb=0 keeps the pure best-fields result
    plain = bm25_multifield_batch(
        spark, d, [(0, q, 25)], fields=flds
    ).collect()
    zero = bm25_multifield_batch(
        spark, d, [(0, q, 25)], fields=flds, tie_breaker=0.0
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in zero] == [
        (r["doc_id"], r["score"]) for r in plain
    ]
    with _pytest.raises(ValueError):
        bm25_multifield_batch(
            spark, d, [(0, q, 5)], fields=flds, tie_breaker=0.3, offset=3
        )
