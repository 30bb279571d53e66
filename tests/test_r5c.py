"""Round-5 wave-3 surface: rate pipeline agg + diversified_sampler."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from oracle.bm25 import BM25Oracle


# ---- rate pipeline agg ------------------------------------------------------


@pytest.fixture(scope="module")
def month_frame(spark):
    return spark.createDataFrame(
        [("2021-01-01 00:00:00", 62), ("2021-02-01 00:00:00", 56),
         ("2021-03-01 00:00:00", 93)],
        "b string, doc_count long",
    ).select(F.col("b").cast("timestamp").alias("bucket"), "doc_count")


def test_rate_month_true_day_spans(spark, month_frame):
    from sparkfts.pipelineaggs import rate_buckets

    got = {
        r["bucket"].month: r["rate"]
        for r in rate_buckets(
            month_frame, "doc_count", interval="month", unit="day"
        ).collect()
    }
    # Jan=31d, Feb 2021=28d, Mar=31d — ACTUAL spans, the documented pin
    assert math.isclose(got[1], 62 / 31)
    assert math.isclose(got[2], 56 / 28)
    assert math.isclose(got[3], 93 / 31)


def test_rate_fixed_intervals_and_units(spark):
    from sparkfts.pipelineaggs import rate_buckets

    df = spark.createDataFrame(
        [("2021-01-01 00:00:00", 48)], "b string, m long"
    ).select(F.col("b").cast("timestamp").alias("bucket"), "m")
    # day bucket, hourly rate: 48/24 = 2
    r = rate_buckets(df, "m", interval="day", unit="hour").collect()[0]
    assert math.isclose(r["rate"], 2.0)
    # hour bucket, per-second rate
    r = rate_buckets(df, "m", interval="hour", unit="second").collect()[0]
    assert math.isclose(r["rate"], 48 / 3600)
    # week bucket, per-day rate
    r = rate_buckets(df, "m", interval="week", unit="day").collect()[0]
    assert math.isclose(r["rate"], 48 / 7)


def test_rate_calendar_quarter_year(spark):
    from sparkfts.pipelineaggs import rate_buckets

    df = spark.createDataFrame(
        [("2021-01-01 00:00:00", 900), ("2020-01-01 00:00:00", 732)],
        "b string, m long",
    ).select(F.col("b").cast("timestamp").alias("bucket"), "m")
    got = {
        r["bucket"].year: r["rate"]
        for r in rate_buckets(
            df, "m", interval="quarter", unit="day"
        ).collect()
    }
    assert math.isclose(got[2021], 900 / 90)   # Q1 2021 = 90 days
    assert math.isclose(got[2020], 732 / 91)   # Q1 2020 leap = 91 days
    got = {
        r["bucket"].year: r["rate"]
        for r in rate_buckets(df, "m", interval="year", unit="day")
        .collect()
    }
    assert math.isclose(got[2021], 900 / 365)
    assert math.isclose(got[2020], 732 / 366)  # leap year


def test_rate_validation(spark, month_frame):
    from sparkfts.pipelineaggs import rate_buckets

    with pytest.raises(ValueError, match="unit"):
        rate_buckets(month_frame, "doc_count", interval="month",
                     unit="fortnight")
    with pytest.raises(ValueError, match="interval"):
        rate_buckets(month_frame, "doc_count", interval="decade")


# ---- diversified_sampler ----------------------------------------------------


@pytest.fixture(scope="module")
def r5c_index(spark, pages_df, tmp_path_factory):
    from sparkfts.index import build_index

    d = str(tmp_path_factory.mktemp("r5c_idx"))
    build_index(pages_df, d, n_shards=4, n_tbuckets=8)
    return d


@pytest.fixture(scope="module")
def doc_values(spark, pages_df):
    from sparkfts.tokens import prepare_pages

    return (
        prepare_pages(pages_df)
        .select("doc_id", "url")
        .join(
            pages_df.select(
                "url", "lang", F.length("text").alias("n_chars")
            ),
            "url",
        )
        .select("doc_id", "lang", "n_chars")
    )


@pytest.fixture(scope="module")
def py_oracle(corpus):
    import pandas as pd

    from sparkfts.tokens import sha1_doc_id

    ids = sha1_doc_id(pd.Series(corpus.column("url").to_pylist()))
    return BM25Oracle(
        zip(ids.tolist(), corpus.column("text").to_pylist())
    )


def _mirror_diversified(py_oracle, vals, query, shard_size, max_per):
    """Walk global (-score, doc_id) order, keep <= max_per docs per
    lang, stop after shard_size keeps — the engine's documented pin."""
    occ: Counter = Counter()
    kept = []
    for d, _ in py_oracle.search(query, k=py_oracle.n_docs, mode="or"):
        lang = vals[d]["lang"]
        occ[lang] += 1
        if occ[lang] <= max_per:
            kept.append(vals[d]["n_chars"])
            if len(kept) == shard_size:
                break
    return kept


def test_diversified_sampler_matches_mirror(
    spark, r5c_index, doc_values, py_oracle, queries
):
    from sparkfts.aggs import diversified_sampler_agg

    q = queries[0]["query"]
    vals = {r["doc_id"]: r for r in doc_values.collect()}
    for shard_size, max_per in [(5, 2), (10, 1), (3, 3)]:
        got = diversified_sampler_agg(
            spark, r5c_index, q, doc_values, "n_chars", "lang",
            shard_size=shard_size, max_docs_per_value=max_per, mode="or",
        ).collect()[0]
        kept = _mirror_diversified(py_oracle, vals, q, shard_size, max_per)
        assert kept, "fixture too sparse"
        assert got["sample_count"] == len(kept)
        assert got["min_v"] == min(kept)
        assert got["max_v"] == max(kept)
        assert got["sum_v"] == sum(kept)
        assert math.isclose(got["avg_v"], sum(kept) / len(kept))


def test_diversified_sampler_diversity_bound(
    spark, r5c_index, doc_values, py_oracle, queries
):
    """With max_docs_per_value=1 the sample has one doc per lang, so
    sample_count <= n_distinct(lang) even for huge shard_size."""
    from sparkfts.aggs import diversified_sampler_agg

    q = queries[0]["query"]
    vals = {r["doc_id"]: r for r in doc_values.collect()}
    matched_langs = {
        vals[d]["lang"]
        for d, _ in py_oracle.search(q, k=py_oracle.n_docs, mode="or")
    }
    got = diversified_sampler_agg(
        spark, r5c_index, q, doc_values, "n_chars", "lang",
        shard_size=1_000_000, max_docs_per_value=1, mode="or",
    ).collect()[0]
    assert got["sample_count"] == len(matched_langs)


def test_diversified_sampler_unbounded_equals_stats(
    spark, r5c_index, doc_values, queries
):
    from sparkfts.aggs import diversified_sampler_agg, stats_agg

    q = queries[0]["query"]
    full = stats_agg(
        spark, r5c_index, q, doc_values, "n_chars", mode="or"
    ).collect()[0]
    got = diversified_sampler_agg(
        spark, r5c_index, q, doc_values, "n_chars", "lang",
        shard_size=1_000_000, max_docs_per_value=1_000_000, mode="or",
    ).collect()[0]
    assert got["sample_count"] == full["count"]
    assert got["sum_v"] == full["sum"]
    with pytest.raises(ValueError):
        diversified_sampler_agg(
            spark, r5c_index, q, doc_values, "n_chars", "lang",
            shard_size=0,
        )
    with pytest.raises(ValueError):
        diversified_sampler_agg(
            spark, r5c_index, q, doc_values, "n_chars", "lang",
            shard_size=5, max_docs_per_value=0,
        )
