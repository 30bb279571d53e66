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

Scale shape: the window is k-sized driver data, and the secondary
phrase pass is RESTRICTED to it — the window's doc_ids are pushed into
the positions scan as a predicate and into the phrase kernel as an
include mask (``match_phrase_batch(include_doc_ids=...)``), so only
<= window_size docs are ever position-decoded and scored. A common
phrase ("of the") costs O(window), never O(df(phrase)) — exactly ES's
rescorer cost model (it rescores the window, not the phrase's match
set).
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
    read_meta(index_dir)  # fail fast on a non-index dir
    # the primary window is <= window_size rows BY CONSTRUCTION —
    # collecting it is the rescorer's contract (ES holds the same
    # window in the coordinator), and it becomes the include mask that
    # bounds the secondary pass
    window_rows = bm25_index_batch(
        spark, index_dir, [(0, query, int(window_size))], mode=mode
    ).select("doc_id", "score").collect()
    if not window_rows:
        return spark.createDataFrame(
            [], "rank int, doc_id long, score double"
        )
    window_ids = [int(r["doc_id"]) for r in window_rows]
    primary = spark.createDataFrame(
        [(int(r["doc_id"]), float(r["score"])) for r in window_rows],
        "doc_id long, primary_score double",
    )
    # secondary pass restricted to the window: the kernel receives the
    # <= window_size include ids and the positions scan is pruned to
    # them (see match_phrase_batch docstring)
    secondary = match_phrase_batch(
        spark,
        index_dir,
        [(0, phrase, int(window_size))],
        include_doc_ids={0: window_ids},
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
