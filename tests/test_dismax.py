"""ES ``dis_max`` query (sparkfts.booltree "dismax" node).

Pinned semantics: match set = union of member match sets; score =
best member score + tie_breaker * (sum of the OTHER matching member
scores), with the member-score sum folded in member order (float64) and
the combination computed as ``best + tb * (total - best)`` — the exact
float association the driver oracle replicates.

Ground truth: each member clause executed standalone through the same
kernel (k = n_docs), combined in python per the formula above.
"""

from __future__ import annotations

import pytest

from sparkfts.analysis import tokenize
from sparkfts.querybuilder import Bool, Clause, DisMax, SearchRequest


@pytest.fixture(scope="module")
def dm_index(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index

    d = str(tmp_path_factory.mktemp("dm_idx"))
    build_index(
        spark.createDataFrame(corpus.to_pandas()), d, n_shards=4,
        n_tbuckets=8,
    )
    return d


def _terms(corpus):
    texts = corpus.column("text").to_pylist()
    return tokenize(texts[0])[0], tokenize(texts[1])[2]


def _standalone_scores(spark, idx, clause, n_docs):
    """clause -> {doc_id: score} over the FULL match set."""
    from sparkfts.booltree import bool_topk_batch

    req = SearchRequest(clauses=(clause,), k=n_docs)
    rows = bool_topk_batch(spark, idx, [req]).collect()
    return {r["doc_id"]: r["score"] for r in rows}


@pytest.mark.parametrize("tb", [0.0, 0.3])
def test_dismax_matches_composition(spark, corpus, dm_index, tb):
    from sparkfts.booltree import bool_topk_batch

    t1, t2 = _terms(corpus)
    n_docs = corpus.num_rows
    c1, c2 = Clause(query=t1), Clause(query=t2)
    s1 = _standalone_scores(spark, dm_index, c1, n_docs)
    s2 = _standalone_scores(spark, dm_index, c2, n_docs)
    assert s1 and s2, "test premise: both members match"
    only_union = set(s1) | set(s2)
    both = set(s1) & set(s2)
    assert both, "test premise: overlapping match sets exercise tb"

    expected = {}
    for d in only_union:
        parts = [s for s in (s1.get(d), s2.get(d)) if s is not None]
        best = max(parts)
        total = 0.0
        for p in parts:  # member order
            total += p
        expected[d] = best + tb * (total - best)
    exp_rank = sorted(expected.items(), key=lambda x: (-x[1], x[0]))[:10]

    req = SearchRequest(
        clauses=(DisMax(queries=(c1, c2), tie_breaker=tb),), k=10
    )
    got = bool_topk_batch(spark, dm_index, [req]).collect()
    assert [(r["doc_id"]) for r in got] == [d for d, _ in exp_rank]
    for r, (_, s) in zip(got, exp_rank):
        assert r["score"] == pytest.approx(s, rel=1e-12)


def test_dismax_single_member_passthrough(spark, corpus, dm_index):
    """One member == that member alone, any tie_breaker."""
    from sparkfts.booltree import bool_topk_batch

    t1, _ = _terms(corpus)
    c = Clause(query=t1)
    alone = bool_topk_batch(
        spark, dm_index, [SearchRequest(clauses=(c,), k=10)]
    ).collect()
    dm = bool_topk_batch(
        spark,
        dm_index,
        [SearchRequest(
            clauses=(DisMax(queries=(c,), tie_breaker=0.7),), k=10
        )],
    ).collect()
    assert [tuple(r) for r in alone] == [tuple(r) for r in dm]


def test_dismax_nested_in_bool(spark, corpus, dm_index):
    """DisMax under Bool.must composes with a plain must clause."""
    from sparkfts.booltree import bool_topk_batch

    t1, t2 = _terms(corpus)
    n_docs = corpus.num_rows
    dm = DisMax(queries=(Clause(query=t1), Clause(query=t2)),
                tie_breaker=0.5)
    s1 = _standalone_scores(spark, dm_index, Clause(query=t1), n_docs)
    s2 = _standalone_scores(spark, dm_index, Clause(query=t2), n_docs)
    sm = _standalone_scores(spark, dm_index, Clause(query=t1), n_docs)

    expected = {}
    for d in (set(s1) | set(s2)) & set(sm):
        parts = [s for s in (s1.get(d), s2.get(d)) if s is not None]
        best = max(parts)
        total = 0.0
        for p in parts:
            total += p
        expected[d] = (best + 0.5 * (total - best)) + sm[d]
    exp_rank = sorted(expected.items(), key=lambda x: (-x[1], x[0]))[:10]

    req = SearchRequest(
        clauses=(Bool(must=(dm, Clause(query=t1))),), k=10
    )
    got = bool_topk_batch(spark, dm_index, [req]).collect()
    assert [(r["doc_id"]) for r in got] == [d for d, _ in exp_rank]
    for r, (_, s) in zip(got, exp_rank):
        assert r["score"] == pytest.approx(s, rel=1e-9)
