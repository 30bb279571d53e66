"""Oracle sanity tests: BM25 math, conjunctive semantics, tie-breaks."""

import math

import pytest

from oracle.bm25 import BM25Oracle

DOCS = [
    (1, "the quick brown fox"),
    (2, "the lazy dog"),
    (3, "quick quick fox jumps"),
    (4, "an unrelated document about sparks"),
]


def test_stats():
    o = BM25Oracle(DOCS)
    assert o.n_docs == 4
    assert o.doclen == {1: 4, 2: 3, 3: 4, 4: 5}
    assert o.avgdl == 4.0
    assert o.df("quick") == 2
    assert o.df("the") == 2
    assert o.df("nosuch") == 0


def test_idf_formula():
    o = BM25Oracle(DOCS)
    # idf = ln(1 + (N - df + .5)/(df + .5)) with N=4, df=2
    assert o.idf("quick") == pytest.approx(math.log(1 + 2.5 / 2.5), rel=1e-12)


def test_conjunctive_and():
    o = BM25Oracle(DOCS)
    hits = o.search("quick fox")
    assert [d for d, _ in hits] == [3, 1] or [d for d, _ in hits] == [1, 3]
    # doc 3 has tf(quick)=2 -> must outrank doc 1
    assert hits[0][0] == 3
    # "the quick" requires both terms -> only doc 1
    assert [d for d, _ in o.search("the quick")] == [1]
    # empty intersection
    assert o.search("quick lazy") == []
    # absent term
    assert o.search("zzz") == []
    # empty query
    assert o.search("") == []


def test_disjunctive_or():
    o = BM25Oracle(DOCS)
    hits = o.search("quick lazy", mode="or")
    assert {d for d, _ in hits} == {1, 2, 3}


def test_case_folding_and_dedup():
    o = BM25Oracle(DOCS)
    assert o.search("QUICK Quick quick") == o.search("quick")


def test_tiebreak_doc_id_asc():
    # two identical docs -> identical scores -> doc_id ascending
    o = BM25Oracle([(7, "same text"), (3, "same text"), (9, "other words")])
    hits = o.search("same text")
    assert [d for d, _ in hits] == [3, 7]
    assert hits[0][1] == hits[1][1]


def test_k_limits():
    o = BM25Oracle(DOCS)
    assert len(o.search("the", k=1)) == 1
    assert len(o.search("the", k=100)) == 2


def test_duplicate_doc_id_rejected():
    with pytest.raises(ValueError):
        BM25Oracle([(1, "a"), (1, "b")])
