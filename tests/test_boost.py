"""ES query-level boost (round 5): Lucene BoostQuery semantics — one
multiply after the node's own fold — through the bool-tree kernel,
query_string ``^N`` syntax, and esdsl ``boost`` options."""

from __future__ import annotations

import numpy as np
import pytest

from sparkfts.querybuilder import Bool, Clause, SearchRequest
from sparkfts.querystring import QueryStringError, parse_query_string


@pytest.fixture(scope="module")
def boost_index(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index

    d = str(tmp_path_factory.mktemp("boost_idx"))
    build_index(
        spark.createDataFrame(corpus.to_pandas()), d,
        n_shards=4, n_tbuckets=8,
    )
    return d


def test_query_string_boost_parse():
    c = parse_query_string("word^2")
    assert isinstance(c, Clause) and c.boost == 2.0
    g = parse_query_string("(a b)^0.5")
    assert isinstance(g, Bool) and g.boost == 0.5
    # stacked boosts multiply
    s = parse_query_string("(word^2)^3")
    assert s.boost == 6.0
    # field group boost
    fg = parse_query_string("text:(a b)^4", fields=("text",))
    assert fg.boost == 4.0
    # boost composes with fuzziness
    fz = parse_query_string("word~^2")
    assert fz.boost == 2.0 and fz.fuzziness == "AUTO"
    with pytest.raises(QueryStringError):  # dangling ^ (end of query)
        parse_query_string("a^")
    with pytest.raises(QueryStringError, match="invalid boost"):
        parse_query_string("a^x")
    with pytest.raises(QueryStringError):  # '-' lexes as prohibit op
        parse_query_string("a^-1")


def test_boost_scales_scores_exactly(spark, corpus, boost_index):
    """Single boosted clause: scores are EXACTLY base * boost (one
    float64 multiply), ranking unchanged."""
    from sparkfts.booltree import bool_topk_batch

    base = bool_topk_batch(
        spark, boost_index,
        [SearchRequest(clauses=(Clause(query="word"),), k=20)],
    ).collect()
    boosted = bool_topk_batch(
        spark, boost_index,
        [SearchRequest(clauses=(Clause(query="word", boost=2.5),), k=20)],
    ).collect()
    assert [r["doc_id"] for r in base] == [r["doc_id"] for r in boosted]
    assert all(
        b["score"] == a["score"] * 2.5 for a, b in zip(base, boosted)
    )
    assert base


def test_boost_inside_bool_composition(spark, corpus, boost_index):
    """'a^2 | b' == 2*score(a) + score(b) per matching doc (member
    scores computed from the single-leaf match sets)."""
    from sparkfts.booltree import bool_matches_batch

    a, b = "word", "one"
    leaf = {
        t: {
            r["doc_id"]: r["score"]
            for r in bool_matches_batch(
                spark, boost_index,
                [SearchRequest(clauses=(Clause(query=t),), k=1)],
            ).collect()
        }
        for t in (a, b)
    }
    tree = Bool(should=(Clause(query=a, boost=2.0), Clause(query=b)))
    got = {
        r["doc_id"]: r["score"]
        for r in bool_matches_batch(
            spark, boost_index,
            [SearchRequest(clauses=(tree,), k=1)],
        ).collect()
    }
    assert set(got) == set(leaf[a]) | set(leaf[b])
    for d, s in got.items():
        want = 2.0 * leaf[a].get(d, 0.0) + leaf[b].get(d, 0.0)
        assert s == pytest.approx(want, abs=1e-12), d


def test_bool_level_boost(spark, corpus, boost_index):
    """Bool(boost=b) multiplies the whole bool's fold once."""
    from sparkfts.booltree import bool_topk_batch

    tree = Bool(must=(Clause(query="word"), Clause(query="one")))
    base = bool_topk_batch(
        spark, boost_index, [SearchRequest(clauses=(tree,), k=15)]
    ).collect()
    import dataclasses

    boosted = bool_topk_batch(
        spark, boost_index,
        [SearchRequest(
            clauses=(dataclasses.replace(tree, boost=0.5),), k=15
        )],
    ).collect()
    assert [r["doc_id"] for r in base] == [r["doc_id"] for r in boosted]
    assert all(
        b["score"] == a["score"] * 0.5 for a, b in zip(base, boosted)
    )
    assert base


def test_esdsl_boost(spark, corpus, boost_index):
    from sparkfts.booltree import bool_topk_batch
    from sparkfts.esdsl import EsDslError, parse_query, parse_request

    c = parse_query({"match": {"text": {"query": "x", "boost": 3}}})
    assert c.boost == 3.0
    n = parse_query({"bool": {"must": [{"match": {"text": "x"}}],
                              "boost": 2}})
    assert n.boost == 2.0
    p = parse_query({"prefix": {"text": {"value": "wo", "boost": 1.5}}})
    assert p.boost == 1.5
    with pytest.raises(EsDslError, match="negative"):
        parse_query({"match": {"text": {"query": "x", "boost": -1}}})
    # end-to-end: DSL boost == typed-IR boost
    req = parse_request(
        {"query": {"match": {"text": {"query": "word", "boost": 2.5}}},
         "size": 10}
    )
    got = bool_topk_batch(spark, boost_index, [req]).collect()
    want = bool_topk_batch(
        spark, boost_index,
        [SearchRequest(clauses=(Clause(query="word", operator="or",
                                       fuzziness="0", boost=2.5),),
                       k=10)],
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_query_string_boost_end_to_end(spark, corpus, boost_index):
    """'word^2 (one lute)^0.5' (OR): score == 2*s_word +
    0.5*(s_one + s_lute) over the union match set."""
    from sparkfts.booltree import bool_matches_batch
    from sparkfts.querystring import query_string_topk_batch

    leaf = {
        t: {
            r["doc_id"]: r["score"]
            for r in bool_matches_batch(
                spark, boost_index,
                [SearchRequest(
                    clauses=(Clause(query=t, fuzziness="0"),), k=1
                )],
            ).collect()
        }
        for t in ("word", "one", "lute")
    }
    got = query_string_topk_batch(
        spark, boost_index, [(0, "word^2 (one lute)^0.5", 10)]
    ).collect()
    union = set().union(*leaf.values())
    expect = []
    for d in union:
        s = 2.0 * leaf["word"].get(d, 0.0) + 0.5 * (
            leaf["one"].get(d, 0.0) + leaf["lute"].get(d, 0.0)
        )
        expect.append((d, s))
    expect.sort(key=lambda x: (-x[1], x[0]))
    expect = expect[:10]
    assert [r["doc_id"] for r in got] == [d for d, _ in expect]
    assert np.allclose(
        [r["score"] for r in got], [s for _, s in expect], atol=1e-9
    )
