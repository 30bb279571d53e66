"""bool.minimum_should_match in the single-pass kernel (round 5):
should-only msm>1, must+should constraining msm (ES: should stops
being a pure bonus), value grammar resolution, unsatisfiable -> empty,
esdsl lowering. Mirrors built from single-leaf match frames."""

from __future__ import annotations

import pytest

from sparkfts.querybuilder import Bool, Clause, SearchRequest


@pytest.fixture(scope="module")
def msm_index(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index

    d = str(tmp_path_factory.mktemp("msm_idx"))
    build_index(
        spark.createDataFrame(corpus.to_pandas()), d,
        n_shards=4, n_tbuckets=8,
    )
    return d


def _leaf_frames(spark, idx, terms):
    from sparkfts.booltree import bool_matches_batch

    return {
        t: {
            r["doc_id"]: r["score"]
            for r in bool_matches_batch(
                spark, idx,
                [SearchRequest(
                    clauses=(Clause(query=t, fuzziness="0"),), k=1
                )],
            ).collect()
        }
        for t in terms
    }


TERMS = ("word", "one", "lute")


def _run(spark, idx, tree):
    from sparkfts.booltree import bool_matches_batch

    return {
        r["doc_id"]: r["score"]
        for r in bool_matches_batch(
            spark, idx, [SearchRequest(clauses=(tree,), k=1)]
        ).collect()
    }


def test_should_only_msm2(spark, corpus, msm_index):
    leaf = _leaf_frames(spark, msm_index, TERMS)
    tree = Bool(
        should=tuple(Clause(query=t, fuzziness="0") for t in TERMS),
        minimum_should_match=2,
    )
    got = _run(spark, msm_index, tree)
    union = set().union(*leaf.values())
    want = {}
    for d in union:
        hits = [t for t in TERMS if d in leaf[t]]
        if len(hits) >= 2:
            want[d] = sum(leaf[t][d] for t in TERMS if d in leaf[t])
    assert got.keys() == want.keys()
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-12)
    assert got and len(got) < len(union)  # msm actually pruned


def test_must_plus_should_msm_constrains(spark, corpus, msm_index):
    """ES: with minimum_should_match set, should members CONSTRAIN even
    when must is present (no longer a pure bonus)."""
    leaf = _leaf_frames(spark, msm_index, TERMS)
    a, b, c = TERMS
    tree = Bool(
        must=(Clause(query=a, fuzziness="0"),),
        should=(Clause(query=b, fuzziness="0"),
                Clause(query=c, fuzziness="0")),
        minimum_should_match=1,
    )
    got = _run(spark, msm_index, tree)
    want = {}
    for d, sa in leaf[a].items():
        hits = [t for t in (b, c) if d in leaf[t]]
        if hits:
            want[d] = sa + sum(leaf[t][d] for t in hits)
    assert got.keys() == want.keys()
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-12)
    # default (None): pure bonus — every must match survives
    bonus_tree = Bool(
        must=(Clause(query=a, fuzziness="0"),),
        should=(Clause(query=b, fuzziness="0"),
                Clause(query=c, fuzziness="0")),
    )
    assert _run(spark, msm_index, bonus_tree).keys() == leaf[a].keys()
    assert len(want) < len(leaf[a])  # the constraint actually bit


def test_msm_value_grammar_and_unsatisfiable(spark, corpus, msm_index):
    leaf = _leaf_frames(spark, msm_index, TERMS)
    shoulds = tuple(Clause(query=t, fuzziness="0") for t in TERMS)
    # "67%" of 3 -> floor(2.01) = 2 == msm=2
    pct = _run(
        spark, msm_index,
        Bool(should=shoulds, minimum_should_match="67%"),
    )
    two = _run(
        spark, msm_index, Bool(should=shoulds, minimum_should_match=2)
    )
    assert pct == two
    # -1 -> 3-1 = 2
    neg = _run(
        spark, msm_index, Bool(should=shoulds, minimum_should_match=-1)
    )
    assert neg == two
    # above the clause count: unsatisfiable -> empty (Lucene pin)
    assert _run(
        spark, msm_index, Bool(should=shoulds, minimum_should_match=4)
    ) == {}
    # no should clauses: option ignored (ES behavior)
    m = _run(
        spark, msm_index,
        Bool(must=(Clause(query="word", fuzziness="0"),),
             minimum_should_match=2),
    )
    assert m.keys() == leaf["word"].keys()


def test_esdsl_bool_msm(spark, corpus, msm_index):
    from sparkfts.booltree import bool_topk_batch
    from sparkfts.esdsl import parse_request

    body = {"query": {"bool": {
        "should": [{"match": {"text": {"query": t, "fuzziness": 0,
                                       "operator": "and"}}}
                   for t in TERMS],
        "minimum_should_match": 2,
    }}, "size": 15}
    req = parse_request(body)
    assert req.clauses[0].minimum_should_match == 2
    got = bool_topk_batch(spark, msm_index, [req]).collect()
    want = bool_topk_batch(
        spark, msm_index,
        [SearchRequest(clauses=(Bool(
            should=tuple(Clause(query=t, fuzziness="0") for t in TERMS),
            minimum_should_match=2,
        ),), k=15)],
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got
