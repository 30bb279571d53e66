"""Round-5 wave-2 surface: string_stats / median_absolute_deviation /
matrix_stats / sampler aggs, normalize + moving_percentiles pipeline
aggs, multi_match most_fields, ids + exists queries."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from oracle.bm25 import BM25Oracle


@pytest.fixture(scope="module")
def r5b_index(spark, pages_df, tmp_path_factory):
    from sparkfts.index import build_index

    d = str(tmp_path_factory.mktemp("r5b_idx"))
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
                "url", "lang", "text",
                F.length("text").alias("n_chars"),
            ),
            "url",
        )
        .select(
            "doc_id", "lang", "text", "n_chars",
            (F.col("doc_id") % 5 + 1).cast("long").alias("wt"),
        )
    )


@pytest.fixture(scope="module")
def py_oracle(corpus):
    import pandas as pd

    from sparkfts.tokens import sha1_doc_id

    ids = sha1_doc_id(pd.Series(corpus.column("url").to_pylist()))
    return BM25Oracle(
        zip(ids.tolist(), corpus.column("text").to_pylist())
    )


def _matched(py_oracle, doc_values, query):
    vals = {r["doc_id"]: r for r in doc_values.collect()}
    ids = {
        d
        for d, _ in py_oracle.search(query, k=py_oracle.n_docs, mode="or")
    }
    return [vals[d] for d in ids]


# ---- string_stats ---------------------------------------------------------


def test_string_stats(spark, r5b_index, doc_values, py_oracle, queries):
    from sparkfts.aggs import string_stats_agg

    q = queries[0]["query"]
    got = string_stats_agg(
        spark, r5b_index, q, doc_values, "text", mode="or"
    ).collect()[0]
    texts = [r["text"] for r in _matched(py_oracle, doc_values, q)]
    assert texts, "fixture too sparse"
    lens = [len(t) for t in texts]
    assert got["count"] == len(texts)
    assert got["min_length"] == min(lens)
    assert got["max_length"] == max(lens)
    assert math.isclose(got["avg_length"], sum(lens) / len(lens))
    hist = Counter("".join(texts))
    total = sum(hist.values())
    ent = -sum(
        (n / total) * math.log2(n / total) for n in hist.values()
    )
    assert math.isclose(got["entropy"], ent, rel_tol=1e-9)


# ---- median_absolute_deviation -------------------------------------------


def _pct(xs, p):
    xs = sorted(xs)
    r = p * (len(xs) - 1)
    lo = int(math.floor(r))
    hi = min(lo + 1, len(xs) - 1)
    return xs[lo] + (r - lo) * (xs[hi] - xs[lo])


def test_mad(spark, r5b_index, doc_values, py_oracle, queries):
    from sparkfts.aggs import median_absolute_deviation_agg

    q = queries[0]["query"]
    got = median_absolute_deviation_agg(
        spark, r5b_index, q, doc_values, "n_chars", mode="or"
    ).collect()[0]
    xs = [float(r["n_chars"]) for r in _matched(py_oracle, doc_values, q)]
    med = _pct(xs, 0.5)
    mad = _pct([abs(x - med) for x in xs], 0.5)
    assert got["n"] == len(xs)
    assert math.isclose(got["median"], med)
    assert math.isclose(got["mad"], mad)


def test_mad_empty_match_raises(spark, r5b_index, doc_values):
    from sparkfts.aggs import median_absolute_deviation_agg

    with pytest.raises(ValueError, match="empty"):
        median_absolute_deviation_agg(
            spark, r5b_index, "zzzznotaterm", doc_values, "n_chars"
        )


# ---- matrix_stats ---------------------------------------------------------


def test_matrix_stats(spark, r5b_index, doc_values, py_oracle, queries):
    from sparkfts.aggs import matrix_stats_agg

    q = queries[0]["query"]
    rows = matrix_stats_agg(
        spark, r5b_index, q, doc_values, ["n_chars", "wt"], mode="or"
    ).collect()
    assert [(r["field_x"], r["field_y"]) for r in rows] == [
        ("n_chars", "n_chars"), ("n_chars", "wt"), ("wt", "wt")
    ]
    m = _matched(py_oracle, doc_values, q)
    xs = [r["n_chars"] for r in m]
    ys = [r["wt"] for r in m]
    n = len(m)

    def cov(a, b):
        sa, sb = sum(a), sum(b)
        sab = sum(x * y for x, y in zip(a, b))
        return (sab - sa * sb / n) / (n - 1)

    pair = {(r["field_x"], r["field_y"]): r for r in rows}
    assert all(r["count"] == n for r in rows)
    assert math.isclose(pair[("n_chars", "n_chars")]["covariance"], cov(xs, xs))
    assert math.isclose(pair[("n_chars", "wt")]["covariance"], cov(xs, ys))
    expected_corr = cov(xs, ys) / math.sqrt(cov(xs, xs) * cov(ys, ys))
    assert math.isclose(
        pair[("n_chars", "wt")]["correlation"], expected_corr, rel_tol=1e-12
    )
    assert math.isclose(
        pair[("n_chars", "n_chars")]["correlation"], 1.0, rel_tol=1e-12
    )
    assert math.isclose(
        pair[("n_chars", "wt")]["mean_x"], sum(xs) / n
    )


def test_matrix_stats_validation(spark, r5b_index, doc_values):
    from sparkfts.aggs import matrix_stats_agg

    with pytest.raises(ValueError, match="duplicate"):
        matrix_stats_agg(
            spark, r5b_index, "the", doc_values, ["wt", "wt"]
        )
    with pytest.raises(ValueError, match="non-empty"):
        matrix_stats_agg(spark, r5b_index, "the", doc_values, [])


# ---- sampler --------------------------------------------------------------


def test_sampler_bounds_stats(
    spark, r5b_index, doc_values, py_oracle, queries
):
    from sparkfts.aggs import sampler_agg

    q = queries[0]["query"]
    got = sampler_agg(
        spark, r5b_index, q, doc_values, "n_chars", shard_size=10,
        mode="or",
    ).collect()[0]
    vals = {r["doc_id"]: r["n_chars"] for r in doc_values.collect()}
    top10 = [
        vals[d] for d, _ in py_oracle.search(q, k=10, mode="or")
    ]
    assert got["sample_count"] == len(top10) <= 10
    assert got["min_v"] == min(top10)
    assert got["max_v"] == max(top10)
    assert got["sum_v"] == sum(top10)


def test_sampler_ge_matchset_equals_stats(
    spark, r5b_index, doc_values, py_oracle, queries
):
    from sparkfts.aggs import sampler_agg, stats_agg

    q = queries[0]["query"]
    full = stats_agg(
        spark, r5b_index, q, doc_values, "n_chars", mode="or"
    ).collect()[0]
    sampled = sampler_agg(
        spark, r5b_index, q, doc_values, "n_chars",
        shard_size=1_000_000, mode="or",
    ).collect()[0]
    assert sampled["sample_count"] == full["count"]
    assert sampled["sum_v"] == full["sum"]
    with pytest.raises(ValueError):
        sampler_agg(
            spark, r5b_index, q, doc_values, "n_chars", shard_size=0
        )


# ---- normalize pipeline agg ----------------------------------------------


@pytest.fixture(scope="module")
def bucket_frame(spark):
    return spark.createDataFrame(
        [(1, 4.0), (2, 10.0), (3, 2.0), (4, 8.0)], "bucket int, m double"
    )


def test_normalize_methods(spark, bucket_frame):
    from sparkfts.pipelineaggs import normalize_buckets

    xs = [4.0, 10.0, 2.0, 8.0]
    mn, mx, s, mean = min(xs), max(xs), sum(xs), sum(xs) / 4
    sd = math.sqrt(sum((x - mean) ** 2 for x in xs) / 4)
    exp = {
        "rescale_0_1": [(x - mn) / (mx - mn) for x in xs],
        "rescale_0_100": [100 * (x - mn) / (mx - mn) for x in xs],
        "percent_of_sum": [x / s for x in xs],
        "mean": [(x - mean) / (mx - mn) for x in xs],
        "z-score": [(x - mean) / sd for x in xs],
        "softmax": [
            math.exp(x) / sum(math.exp(y) for y in xs) for x in xs
        ],
    }
    for method, want in exp.items():
        got = [
            r["out"]
            for r in normalize_buckets(
                bucket_frame, "m", method=method, out="out"
            ).orderBy("bucket").collect()
        ]
        assert all(
            math.isclose(g, w, rel_tol=1e-12) for g, w in zip(got, want)
        ), method
    with pytest.raises(ValueError, match="unknown normalize"):
        normalize_buckets(bucket_frame, "m", method="nope")


# ---- moving_percentile ----------------------------------------------------


def test_moving_percentile(spark, bucket_frame):
    from sparkfts.pipelineaggs import moving_percentile

    got = {
        r["bucket"]: r["mp"]
        for r in moving_percentile(
            bucket_frame, "m", window=3, percent=50.0, out="mp"
        ).collect()
    }
    xs = {1: 4.0, 2: 10.0, 3: 2.0, 4: 8.0}
    assert got[1] is None  # empty window
    assert math.isclose(got[2], 4.0)
    assert math.isclose(got[3], _pct([4.0, 10.0], 0.5))
    assert math.isclose(got[4], _pct([4.0, 10.0, 2.0], 0.5))


def test_moving_percentile_edges(spark, bucket_frame):
    from sparkfts.pipelineaggs import moving_percentile

    got = {
        r["bucket"]: r["mp"]
        for r in moving_percentile(
            bucket_frame, "m", window=2, percent=100.0, out="mp"
        ).collect()
    }
    assert math.isclose(got[3], 10.0)  # max of [10, 2]... window [1,2]
    with pytest.raises(ValueError):
        moving_percentile(bucket_frame, "m", window=0)
    with pytest.raises(ValueError):
        moving_percentile(bucket_frame, "m", window=2, percent=101.0)


# ---- most_fields ----------------------------------------------------------


@pytest.fixture(scope="module")
def mf_index(spark, pages_df, tmp_path_factory):
    from sparkfts.multifield import build_multifield_index

    d = str(tmp_path_factory.mktemp("r5b_mf"))
    pages = pages_df.withColumn(
        "title",
        F.array_join(
            F.slice(
                F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"),
                1, 6,
            ),
            " ",
        ),
    )
    build_multifield_index(
        pages, d, fields=("title", "text"), n_shards=4, n_tbuckets=8
    )
    return d


def test_most_fields_is_sum_of_fields(spark, mf_index, queries):
    from sparkfts.multifield import (
        bm25_most_fields_batch,
        bm25_multifield_batch,
    )

    q = queries[0]["query"]
    got = bm25_most_fields_batch(
        spark, mf_index, [(0, q, 10)], fields=["title^2", "text"]
    ).collect()
    assert got, "fixture too sparse"
    # identity: most_fields == dis_max tie_breaker=1.0
    tb = bm25_multifield_batch(
        spark, mf_index, [(0, q, 10)], fields=["title^2", "text"],
        tie_breaker=1.0,
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in tb
    ]
    # sum property: combined >= best_fields max for every shared doc
    best = {
        r["doc_id"]: r["score"]
        for r in bm25_multifield_batch(
            spark, mf_index, [(0, q, 400)], fields=["title^2", "text"]
        ).collect()
    }
    for r in got:
        assert r["score"] >= best[r["doc_id"]] - 1e-9


# ---- ids / exists ---------------------------------------------------------


def test_ids_topk(spark):
    from sparkfts.querybuilder import ids_topk

    docs = spark.createDataFrame(
        [(i,) for i in range(20)], "doc_id long"
    )
    got = ids_topk(docs, [15, 3, 99, 7], k=10).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in got] == [
        (1, 3, 1.0), (2, 7, 1.0), (3, 15, 1.0)
    ]
    assert [r["doc_id"] for r in ids_topk(docs, [5, 4, 3, 2], k=2)
            .collect()] == [2, 3]
    with pytest.raises(ValueError, match="non-empty"):
        ids_topk(docs, [])


def test_exists_topk(spark):
    from sparkfts.querybuilder import exists_topk

    docs = spark.createDataFrame(
        [(i, None if i % 3 == 0 else f"v{i}") for i in range(12)],
        "doc_id long, f string",
    )
    got = exists_topk(docs, "f", k=5).collect()
    assert [r["doc_id"] for r in got] == [1, 2, 4, 5, 7]
    assert all(r["score"] == 1.0 for r in got)
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
