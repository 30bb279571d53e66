"""ES ``rescore``: re-rank the primary query's top window with a more
expensive secondary query (canonically a phrase-proximity query).

Pinned spec (mirrored by the DuckDB oracle in
``__spark_entry__.fts_rescore_topk``), the coordinator-level variant of
ES's rescorer with ``score_mode: total`` (the default):

  1. primary BM25 query -> global top ``window_size`` docs (pinned
     (-score, doc_id) order);
  2. the rescore query (match_phrase here) scores those window docs —
     docs in the window that don't match it contribute 0;
  3. combined = query_weight * primary + rescore_weight * secondary,
     window re-ranked by (-combined, doc_id), top ``k`` returned.

``k <= window_size`` is required (ES: documents below the window keep
their primary order, so a page cut inside the window is exact).

Scale shape: the window is k-sized driver data; the phrase pass is the
standard pruned positional plan. Only the window join is new — a
broadcast of <= window_size ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def rescore_phrase(
    spark: SparkSession,
    index_dir: str,
    query: str,
    phrase: str,
    k: int = 10,
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    mode: str = "or",
) -> DataFrame:
    """-> (rank, doc_id, score): phrase-rescored top-k of the primary
    BM25 query's top ``window_size`` window."""
    from sparkfts.index import read_meta
    from sparkfts.phrase import match_phrase_batch
    from sparkfts.query import bm25_index_batch

    if k > window_size:
        raise ValueError("k must be <= window_size")
    meta = read_meta(index_dir)
    primary = bm25_index_batch(
        spark, index_dir, [(0, query, int(window_size))], mode=mode
    ).select("doc_id", F.col("score").alias("primary_score"))
    # full phrase match set (phrase dfs are small); the join below
    # restricts to the window
    secondary = match_phrase_batch(
        spark, index_dir, [(0, phrase, int(meta["n_docs"]))]
    ).select("doc_id", F.col("score").alias("rescore_score"))
    combined = (
        primary.join(secondary, "doc_id", "left")
        .withColumn(
            "score",
            F.lit(float(query_weight)) * F.col("primary_score")
            + F.lit(float(rescore_weight))
            * F.coalesce(F.col("rescore_score"), F.lit(0.0)),
        )
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        combined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(int(k)))
        .select("rank", "doc_id", "score")
        .orderBy("rank")
    )
