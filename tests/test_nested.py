"""ES nested field type: independent element matching, score modes,
nested/reverse_nested aggs."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from sparkfts.nested import (
    nested_match_count,
    nested_query,
    nested_score,
    nested_terms_agg,
)


@pytest.fixture(scope="module")
def ndf(spark):
    rows = [
        Row(doc_id=1, items=[
            Row(a=1, b=2, tag="x"), Row(a=5, b=9, tag="y")]),
        # the cross-matching trap doc: a=1 and b=9 exist but never
        # together in one element
        Row(doc_id=2, items=[
            Row(a=1, b=5, tag="x"), Row(a=3, b=9, tag="x")]),
        Row(doc_id=3, items=[Row(a=1, b=9, tag="z")]),
        Row(doc_id=4, items=[]),
    ]
    return spark.createDataFrame(rows)


def test_nested_no_cross_matching(ndf):
    """a=1 AND b=9 must match only the doc where ONE element has both."""
    got = {r["doc_id"] for r in nested_query(
        ndf, "items", "_n.a = 1 AND _n.b = 9"
    ).collect()}
    assert got == {3}
    # a flat AND over separate exists-checks would wrongly include 2
    flat = {r["doc_id"] for r in nested_query(
        ndf, "items", "_n.a = 1"
    ).collect()} & {r["doc_id"] for r in nested_query(
        ndf, "items", "_n.b = 9"
    ).collect()}
    assert 2 in flat  # demonstrating what nested semantics prevent


def test_nested_min_matches(ndf):
    got = {r["doc_id"] for r in nested_query(
        ndf, "items", "_n.tag = 'x'", min_matches=2
    ).collect()}
    assert got == {2}
    with pytest.raises(ValueError):
        nested_query(ndf, "items", "_n.a = 1", min_matches=0)


@pytest.mark.parametrize(
    "mode,expected",
    [
        ("sum", {1: 3.0, 2: 18.0, 3: 10.0}),
        ("max", {1: 3.0, 2: 12.0, 3: 10.0}),
        ("min", {1: 3.0, 2: 6.0, 3: 10.0}),
        ("avg", {1: 3.0, 2: 9.0, 3: 10.0}),
        ("none", {1: 0.0, 2: 0.0, 3: 0.0}),
    ],
)
def test_nested_score_modes(ndf, mode, expected):
    # matching elements (a <= 3) scored by a + b:
    # doc1: (1,2)->3 ; doc2: (1,5)->6, (3,9)->12 ; doc3: (1,9)->10
    got = {
        r["doc_id"]: r["score"]
        for r in nested_score(
            ndf, "items", "_n.a <= 3", "_n.a + _n.b", score_mode=mode
        ).collect()
    }
    assert got == expected


def test_nested_score_drops_nonmatching_docs(ndf):
    got = {r["doc_id"] for r in nested_score(
        ndf, "items", "_n.a = 99", "_n.a", score_mode="sum"
    ).collect()}
    assert got == set()
    with pytest.raises(ValueError):
        nested_score(ndf, "items", "_n.a = 1", "_n.a", score_mode="mean")


def test_nested_terms_agg_elements_vs_parents(spark, ndf):
    # element counting: tag 'x' appears 3 times across docs 1,2
    rows = nested_terms_agg(ndf, "items", "tag").collect()
    got = {r["value"]: r["doc_count"] for r in rows}
    assert got == {"x": 3, "y": 1, "z": 1}
    # reverse_nested: parent docs per tag
    rows = nested_terms_agg(
        ndf, "items", "tag", reverse_nested=True
    ).collect()
    got = {r["value"]: r["doc_count"] for r in rows}
    assert got == {"x": 2, "y": 1, "z": 1}
    # predicate-restricted
    rows = nested_terms_agg(
        ndf, "items", "tag", predicate="_n.b >= 9"
    ).collect()
    assert {r["value"]: r["doc_count"] for r in rows} == {
        "x": 1, "y": 1, "z": 1,
    }


def test_nested_match_count_no_python_plan(ndf, spark, tmp_path):
    import os

    p = os.path.join(str(tmp_path), "nested.parquet")
    ndf.write.parquet(p)
    df = spark.read.parquet(p)
    out = df.select(nested_match_count("items", "_n.a = 1").alias("c"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    got = {r["c"] for r in out.collect()}
    assert got == {0, 1}
