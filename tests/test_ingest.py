"""ES ingest pipelines -> one Catalyst projection."""

from __future__ import annotations

import pandas as pd
import pytest

from sparkfts.ingest import apply_pipeline


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["HTTPS://A.EX/p ", "https://b.ex/q"],
                "text": ["Hello  World", "foo,bar,baz"],
                "n": ["41", "42"],
                "ts_raw": ["2024-01-02 03:04:05", "2024-06-07 08:09:10"],
            }
        )
    )


def test_pipeline_chain(spark, df):
    out = apply_pipeline(
        df,
        [
            {"trim": {"field": "url"}},
            {"lowercase": {"field": "url"}},
            {"rename": {"field": "text", "target_field": "body"}},
            {"gsub": {"field": "body", "pattern": "\\s+",
                      "replacement": " "}},
            {"set": {"field": "source", "value": "crawl"}},
            {"set": {"field": "body_copy", "copy_from": "body"}},
            {"convert": {"field": "n", "type": "long"}},
            {"date": {"field": "ts_raw", "target_field": "ts",
                      "formats": ["yyyy-MM-dd HH:mm:ss"]}},
            {"remove": {"field": "ts_raw"}},
        ],
    )
    rows = sorted(out.collect(), key=lambda r: r["url"])
    assert out.columns == ["url", "body", "n", "source", "body_copy", "ts"]
    r = rows[0]
    assert r["url"] == "https://a.ex/p"
    assert r["body"] == "Hello World" == r["body_copy"]
    assert r["n"] == 41 and isinstance(r["n"], int)
    assert r["source"] == "crawl"
    assert str(r["ts"]) == "2024-01-02 03:04:05"


def test_split_join_roundtrip(spark, df):
    out = apply_pipeline(
        df,
        [
            {"split": {"field": "text", "separator": ","}},
            {"join": {"field": "text", "separator": "|"}},
        ],
    )
    got = {r["url"]: r["text"] for r in out.collect()}
    assert got["https://b.ex/q"] == "foo|bar|baz"


def test_fail_loud(spark, df):
    for bad in (
        [{"nope": {}}],
        [{"set": {"field": "x"}}],
        [{"rename": {"field": "missing", "target_field": "y"}}],
        [{"convert": {"field": "n", "type": "decimal"}}],
        [{"fail": {"if_missing": "lang", "message": "need lang"}}],
        [{"date": {"field": "ts_raw", "target_field": "t",
                   "formats": ["a", "b"]}}],
        ["not-a-dict"],
    ):
        with pytest.raises((ValueError, TypeError, AttributeError)):
            apply_pipeline(df, bad)
    # fail passes silently when the field exists
    out = apply_pipeline(df, [{"fail": {"if_missing": "url"}}])
    assert out.count() == 2


def test_single_projection_plan(spark, df, tmp_path):
    import os

    p = os.path.join(str(tmp_path), "pages.parquet")
    df.write.parquet(p)
    out = apply_pipeline(
        spark.read.parquet(p),
        [
            {"lowercase": {"field": "url"}},
            {"trim": {"field": "url"}},
            {"set": {"field": "k", "value": 1}},
            {"gsub": {"field": "text", "pattern": ",", "replacement": " "}},
        ],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the whole chain folds into ONE Project node
    assert plan.count("Project") == 1
    assert "BatchEvalPython" not in plan
