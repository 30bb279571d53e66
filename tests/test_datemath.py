"""ES date-math grammar + range-filter pushdown."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from sparkfts.datemath import date_range_filter, resolve_date_math

NOW = datetime(2024, 3, 15, 10, 30, 45, 123456)


@pytest.mark.parametrize(
    "expr,up,exp",
    [
        ("now", False, NOW),
        ("now-7d", False, datetime(2024, 3, 8, 10, 30, 45, 123456)),
        ("now-7d/d", False, datetime(2024, 3, 8)),
        ("now-7d/d", True, datetime(2024, 3, 9)),
        ("now/w", False, datetime(2024, 3, 11)),  # Monday
        ("now/M", False, datetime(2024, 3, 1)),
        ("now/M", True, datetime(2024, 4, 1)),
        ("now/y", False, datetime(2024, 1, 1)),
        ("now+2h-30m", False, datetime(2024, 3, 15, 12, 0, 45, 123456)),
        ("2024-01-31||+1M", False, datetime(2024, 2, 29)),  # day clamp
        ("2024-02-29||+1y", False, datetime(2025, 2, 28)),
        ("2024-01-10||/d", False, datetime(2024, 1, 10)),
        ("now/s", False, datetime(2024, 3, 15, 10, 30, 45)),
        ("now/h", True, datetime(2024, 3, 15, 11, 0)),
    ],
)
def test_resolve_grid(expr, up, exp):
    assert resolve_date_math(expr, NOW, round_up=up) == exp


def test_resolve_fail_loud():
    for bad in ("", "today", "2024-01-01+1d", "now/2d", "now+d",
                "now-7q", "xx||/d", "now-7d extra"):
        with pytest.raises(ValueError):
            resolve_date_math(bad, NOW)


def test_date_range_filter_pushdown(spark, tmp_path):
    import os

    pdf = pd.DataFrame(
        {
            "id": range(10),
            "ts": pd.date_range("2024-03-01", periods=10, freq="D"),
        }
    )
    p = os.path.join(str(tmp_path), "ts.parquet")
    spark.createDataFrame(pdf).write.parquet(p)
    df = spark.read.parquet(p)
    out = date_range_filter(df, "ts", "now-7d/d", None, now=NOW,
                            lte="now/d")
    got = sorted(r["id"] for r in out.collect())
    # gte 2024-03-08 00:00, lte now/d -> < 2024-03-16 00:00 (round UP)
    assert got == [7, 8, 9]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(ts" in plan
    with pytest.raises(ValueError):
        date_range_filter(df, "ts", None, None, now=NOW)
    with pytest.raises(ValueError, match="mutually exclusive"):
        date_range_filter(df, "ts", None, "now/d", now=NOW, lte="now/d")


def test_date_range_lt_rounds_down_like_es(spark, tmp_path):
    """r4 ADVICE: ES `lt: now/d` excludes today ENTIRELY (bound rounds
    DOWN); `lte: now/d` includes all of today (bound rounds UP)."""
    import os

    pdf = pd.DataFrame(
        {
            "id": range(10),
            "ts": pd.date_range("2024-03-08", periods=10, freq="D"),
        }
    )
    p = os.path.join(str(tmp_path), "ts2.parquet")
    spark.createDataFrame(pdf).write.parquet(p)
    df = spark.read.parquet(p)
    # NOW is 2024-03-15 10:30: ids 0..9 span 03-08..03-17
    lt = sorted(r["id"] for r in
                date_range_filter(df, "ts", None, "now/d", now=NOW).collect())
    assert lt == [0, 1, 2, 3, 4, 5, 6]  # 03-08..03-14, today excluded
    lte = sorted(r["id"] for r in
                 date_range_filter(df, "ts", None, None, now=NOW,
                                   lte="now/d").collect())
    assert lte == [0, 1, 2, 3, 4, 5, 6, 7]  # today (03-15) included
    # un-rounded lte includes the exact resolved instant
    exact = sorted(
        r["id"] for r in date_range_filter(
            df, "ts", None, None, now=datetime(2024, 3, 10),
            lte="now",
        ).collect()
    )
    assert exact == [0, 1, 2]  # 03-10 00:00 row itself included
