"""ES pipeline aggregations over a parent bucket frame."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


BUCKETS = [
    # (bucket, doc_count, total)
    (1, 10, 100.0),
    (2, 7, 35.0),
    (3, 12, 60.0),
    (4, 3, 90.0),
    (5, 8, 16.0),
]


@pytest.fixture(scope="module")
def bdf(spark):
    return spark.createDataFrame(
        BUCKETS, "bucket int, doc_count long, total double"
    )


def test_cumulative_sum(bdf):
    from sparkfts.pipelineaggs import cumulative_sum

    rows = cumulative_sum(bdf, "doc_count").orderBy("bucket").collect()
    run, exp = 0, []
    for _, c, _t in BUCKETS:
        run += c
        exp.append(run)
    assert [r["cumulative_sum"] for r in rows] == exp


def test_derivative_and_serial_diff(bdf):
    from sparkfts.pipelineaggs import derivative, serial_diff

    rows = derivative(bdf, "doc_count").orderBy("bucket").collect()
    counts = [c for _, c, _ in BUCKETS]
    assert rows[0]["derivative"] is None  # ES omits the first bucket
    assert [r["derivative"] for r in rows[1:]] == [
        counts[i] - counts[i - 1] for i in range(1, len(counts))
    ]

    rows = serial_diff(bdf, "doc_count", lag=2).orderBy("bucket").collect()
    assert [r["serial_diff"] for r in rows[:2]] == [None, None]
    assert [r["serial_diff"] for r in rows[2:]] == [
        counts[i] - counts[i - 2] for i in range(2, len(counts))
    ]


def test_moving_avg_excludes_current_by_default(bdf):
    """ES moving_fn shift=0: window [i-window, i) — current excluded."""
    from sparkfts.pipelineaggs import moving_avg

    rows = moving_avg(bdf, "doc_count", window=2).orderBy("bucket").collect()
    counts = [c for _, c, _ in BUCKETS]
    assert rows[0]["moving_avg"] is None  # empty window
    assert rows[1]["moving_avg"] == counts[0]  # one prior value
    for i in range(2, len(counts)):
        assert math.isclose(
            rows[i]["moving_avg"], (counts[i - 1] + counts[i - 2]) / 2
        )


def test_moving_avg_shift_includes_current(bdf):
    from sparkfts.pipelineaggs import moving_avg

    rows = (
        moving_avg(bdf, "doc_count", window=2, shift=1)
        .orderBy("bucket")
        .collect()
    )
    counts = [c for _, c, _ in BUCKETS]
    assert rows[0]["moving_avg"] == counts[0]
    for i in range(1, len(counts)):
        assert math.isclose(
            rows[i]["moving_avg"], (counts[i] + counts[i - 1]) / 2
        )


def test_bucket_script_and_selector(bdf):
    from sparkfts.pipelineaggs import bucket_script, bucket_selector

    scripted = bucket_script(
        bdf, "avg_total", F.col("total") / F.col("doc_count")
    )
    kept = (
        bucket_selector(scripted, F.col("avg_total") > 5.0)
        .orderBy("bucket")
        .collect()
    )
    exp = [b for b, c, t in BUCKETS if t / c > 5.0]
    assert [r["bucket"] for r in kept] == exp


def test_bucket_sort_paging(bdf):
    from sparkfts.pipelineaggs import bucket_sort

    rows = bucket_sort(
        bdf, [("doc_count", "desc"), ("bucket", "asc")], from_=1, size=2
    ).collect()
    ranked = sorted(BUCKETS, key=lambda b: (-b[1], b[0]))
    assert [r["bucket"] for r in rows] == [b for b, _, _ in ranked[1:3]]


def test_sibling_buckets(bdf):
    from sparkfts.pipelineaggs import (
        avg_bucket,
        max_bucket,
        min_bucket,
        stats_bucket,
        sum_bucket,
    )

    counts = [c for _, c, _ in BUCKETS]
    assert sum_bucket(bdf, "doc_count").collect()[0]["value"] == sum(counts)
    assert min_bucket(bdf, "doc_count").collect()[0]["value"] == min(counts)
    assert max_bucket(bdf, "doc_count").collect()[0]["value"] == max(counts)
    assert math.isclose(
        avg_bucket(bdf, "doc_count").collect()[0]["value"],
        sum(counts) / len(counts),
    )
    st = stats_bucket(bdf, "doc_count").collect()[0]
    assert st["count"] == len(counts)
    assert st["sum"] == sum(counts)
    assert math.isclose(st["avg"], sum(counts) / len(counts))
