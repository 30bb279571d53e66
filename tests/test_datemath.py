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
    out = date_range_filter(df, "ts", "now-7d/d", "now/d", now=NOW)
    got = sorted(r["id"] for r in out.collect())
    # gte 2024-03-08 00:00, lt 2024-03-16 00:00 (round UP of now/d)
    assert got == [7, 8, 9]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(ts" in plan
    with pytest.raises(ValueError):
        date_range_filter(df, "ts", None, None, now=NOW)
