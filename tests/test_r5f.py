"""Round-5 wave-6: cumulative_cardinality, percentiles_bucket,
children/parent aggregation scopes — python mirrors + contract pins."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_cumulative_cardinality_mirror(spark):
    """Exact pin: cumulative_cardinality[i] == true distinct count of
    values in buckets <= i; first_seen attributes each value to its
    min bucket; null values ignored; empty buckets carry forward."""
    from sparkfts.pipelineaggs import cumulative_cardinality

    rng = np.random.Generator(np.random.PCG64(7))
    rows = [
        (int(b), int(v) if v >= 0 else None)
        for b, v in zip(
            rng.integers(0, 12, 400), rng.integers(-3, 25, 400)
        )
    ]
    df = spark.createDataFrame(rows, "b long, v long")
    got = {
        r["bucket"]: (r["first_seen"], r["cumulative_cardinality"])
        for r in cumulative_cardinality(df, "b", "v").collect()
    }
    buckets = sorted({b for b, _ in rows})
    assert set(got) == set(buckets)
    seen: set = set()
    for b in buckets:
        new = {
            v for bb, v in rows if bb == b and v is not None
        } - seen
        # first_seen counts values whose MIN bucket is b
        firsts = sum(
            1
            for v in {v for _, v in rows if v is not None}
            if min(bb for bb, vv in rows if vv == v) == b
        )
        seen |= {v for bb, v in rows if bb == b and v is not None}
        assert got[b][0] == firsts, b
        assert got[b][1] == len(seen), b


def test_cumulative_cardinality_empty_bucket_carries(spark):
    df = spark.createDataFrame(
        [(0, 1), (0, 2), (1, None), (2, 1), (3, 3)], "b long, v long"
    )
    from sparkfts.pipelineaggs import cumulative_cardinality

    rows = {
        r["bucket"]: (r["first_seen"], r["cumulative_cardinality"])
        for r in cumulative_cardinality(df, "b", "v").collect()
    }
    assert rows == {0: (2, 2), 1: (0, 2), 2: (0, 2), 3: (1, 3)}


def test_percentiles_bucket_mirror(spark):
    """Exact percentile_cont interpolation over the bucket metric
    (numpy 'linear' is the same definition)."""
    from sparkfts.pipelineaggs import percentiles_bucket

    vals = [3.0, 17.0, 1.0, 9.0, 4.0, 22.0, 8.0]
    buckets = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "bucket long, m double"
    )
    pcts = [0.0, 10.0, 50.0, 90.0, 100.0]
    got = {
        r["pct"]: r["value"]
        for r in percentiles_bucket(buckets, "m", pcts).collect()
    }
    for p in pcts:
        want = float(np.percentile(vals, p, method="linear"))
        assert got[p] == pytest.approx(want, abs=1e-12), p
    with pytest.raises(ValueError):
        percentiles_bucket(buckets, "m", [101.0])


def test_children_parent_scopes(spark):
    """Scope-switch semantics: children of matching parents (no
    duplication/widening), distinct parents of matching children."""
    from sparkfts.parentjoin import children_scope, parent_scope

    parents = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "pk long, tag string"
    )
    children = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12), (3, 13), (4, 14)],
        "fk long, val long",
    )
    got = sorted(
        (r["fk"], r["val"])
        for r in children_scope(
            parents, children, "pk", "fk", "tag = 'a'"
        ).collect()
    )
    assert got == [(1, 10), (1, 11), (3, 13)]
    # columns: child columns only (semi join never widens)
    assert children_scope(
        parents, children, "pk", "fk", "tag = 'a'"
    ).columns == ["fk", "val"]

    # parent_scope: parent 1 has TWO matching children but appears once
    got = sorted(
        r["pk"]
        for r in parent_scope(
            parents, children, "pk", "fk", "val <= 12"
        ).collect()
    )
    assert got == [1, 2]
    assert parent_scope(
        parents, children, "pk", "fk", "val <= 12"
    ).columns == ["pk", "tag"]


def test_children_scope_then_subagg_matches_sql(spark):
    """The entry shape: scope switch + terms sub-agg == plain SQL."""
    from sparkfts.parentjoin import children_scope

    rng = np.random.Generator(np.random.PCG64(11))
    parents = spark.createDataFrame(
        [(int(i), int(rng.integers(0, 2))) for i in range(50)],
        "pk long, flag long",
    )
    children = spark.createDataFrame(
        [
            (int(rng.integers(0, 60)), ["x", "y", "z"][int(rng.integers(0, 3))])
            for _ in range(300)
        ],
        "fk long, cat string",
    )
    parents.createOrReplaceTempView("p5f")
    children.createOrReplaceTempView("c5f")
    got = sorted(
        (r["cat"], r["n"])
        for r in children_scope(parents, children, "pk", "fk", "flag = 1")
        .groupBy("cat")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = sorted(
        (r["cat"], r["n"])
        for r in spark.sql(
            "SELECT cat, count(*) n FROM c5f WHERE fk IN "
            "(SELECT pk FROM p5f WHERE flag = 1) GROUP BY cat"
        ).collect()
    )
    assert got == want and got
