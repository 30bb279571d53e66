"""ES ``_rank_eval``: ranking-quality metrics over rated documents.

The ES API takes a set of search requests plus per-request relevance
ratings and reports a quality metric per request + the mean — the
standard relevance-regression harness users run against an index before
shipping an analyzer/scoring change. Reference relevance: the DSL the
reference emits (reference ElasticsearchToNeo4jSync.py:92-102) is
exactly the kind of templated request ES users evaluate this way.

Pinned metrics (ES's definitions, deterministic):

- ``precision@k``: |relevant in top-k| / k  (ES default divides by k,
  not by retrieved count, when there are k hits; with fewer than k hits
  ES divides by the retrieved count — pinned here the same way).
- ``recall@k``: |relevant in top-k| / |relevant|.
- ``mrr``: 1 / rank of the first relevant hit (0 when none in top-k).
- ``dcg``: sum over hits of (2^rating - 1) / log2(rank + 1)
  (ES dcg with default gains; unrated docs rate 0).

Ratings ride a DataFrame ``(query_id, doc_id, rating)``; a doc is
*relevant* when ``rating >= relevant_threshold`` (ES
``relevant_rating_threshold``, default 1).

Plan shape: ONE batched top-k plan for all requests (the engine's
existing bm25_index_batch), one broadcast-joined ratings frame, one
bounded per-query aggregation over <= n_requests * k rows — the
evaluation never rescans the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_METRICS = ("precision", "recall", "mrr", "dcg")


def rank_eval(
    spark: SparkSession,
    index_dir: str,
    requests: list[tuple[int, str, int]],
    ratings: DataFrame,
    metric: str = "precision",
    mode: str = "or",
    relevant_threshold: int = 1,
) -> DataFrame:
    """-> ``(query_id, metric_value)`` per request, query_id asc.

    ``requests``: (query_id, query_text, k) — evaluated through the
    engine's own batched BM25 plan (so the metric measures THIS index's
    analyzer + scoring, which is the point of _rank_eval).
    ``ratings``: DataFrame(query_id, doc_id, rating).
    """
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {_METRICS}, got {metric!r}")
    from sparkfts.query import bm25_index_batch

    res = bm25_index_batch(spark, index_dir, requests, mode=mode)
    r = ratings.select(
        F.col("query_id").cast("int").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rating").cast("int").alias("rating"),
    )
    hits = res.join(F.broadcast(r), ["query_id", "doc_id"], "left").select(
        "query_id", "rank",
        F.coalesce(F.col("rating"), F.lit(0)).alias("rating"),
    )
    rel = (F.col("rating") >= F.lit(int(relevant_threshold))).cast("int")
    if metric == "precision":
        per_q = hits.groupBy("query_id").agg(
            (F.sum(rel) / F.count("*")).alias("metric_value")
        )
    elif metric == "recall":
        totals = r.where(
            F.col("rating") >= F.lit(int(relevant_threshold))
        ).groupBy("query_id").agg(F.count("*").alias("n_rel"))
        per_q = (
            hits.groupBy("query_id")
            .agg(F.sum(rel).alias("n_hit"))
            .join(totals, "query_id", "left")
            .select(
                "query_id",
                F.when(
                    F.coalesce(F.col("n_rel"), F.lit(0)) > 0,
                    F.col("n_hit") / F.col("n_rel"),
                ).otherwise(F.lit(0.0)).alias("metric_value"),
            )
        )
    elif metric == "mrr":
        per_q = hits.groupBy("query_id").agg(
            F.coalesce(
                F.lit(1.0)
                / F.min(F.when(rel == 1, F.col("rank"))),
                F.lit(0.0),
            ).alias("metric_value")
        )
    else:  # dcg
        gain = (
            F.pow(F.lit(2.0), F.col("rating").cast("double")) - 1.0
        ) / F.log2(F.col("rank").cast("double") + 1.0)
        per_q = hits.groupBy("query_id").agg(
            F.sum(gain).alias("metric_value")
        )
    # requests with zero hits still report (ES does): metric 0
    all_q = spark.createDataFrame(
        [(int(q),) for q, _, _ in requests], "query_id int"
    )
    return (
        all_q.join(per_q, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("metric_value"), F.lit(0.0)).alias(
                "metric_value"
            ),
        )
        .orderBy("query_id")
    )
