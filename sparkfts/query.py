"""Query execution: scan-mode BM25 (indexless baseline slice).

This module is SURVEY.md §7.1 step 2 — the minimum end-to-end slice that
answers a BM25 top-k query with *no index at all*, using only built-in
DataFrame operators plus the tokenize kernel. It is the executable
baseline every later optimization (posting lists, compression, WAND) is
verified against; it also doubles as the "relational glue" the driver
cross-checks against DuckDB.

Replaces, natively, the single delegated call the reference makes:
``self.client.search(index=..., query=query)``
(reference ElasticsearchHandler.py:69) with the conjunctive
``bool.must + multi_match(operator="and")`` semantics the reference's DSL
pins (reference ElasticsearchToNeo4jSync.py:92-102), and the ES-default
top-10-by-score behavior it relies on (reference ElasticsearchHandler.py:52-74).

Determinism contract (rank-identity vs oracle, SURVEY.md §7.3): per-term
float64 partial scores are folded in sorted-term order via
``sort_array(collect_list(struct(term, score)))`` + ``F.aggregate`` —
bit-identical to the oracle's sorted-term Python loop; ties broken by
``(-score, doc_id asc)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkfts import BM25_B, BM25_K1
from sparkfts.analysis import tokenize_query
from sparkfts.stats import idf as idf_fn

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.IntegerType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def _empty_results(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], RESULT_SCHEMA)


def bm25_scan_batch(
    tokens: DataFrame,
    queries: list[tuple[int, str, int]],
    n_docs: int,
    avgdl: float,
    mode: str = "and",
) -> DataFrame:
    """Score a batch of queries in ONE Spark plan over the tokens table.

    Parameters
    ----------
    tokens : DataFrame(doc_id, term, tf, doclen) — one row per distinct pair.
    queries : list of (query_id, query_text, k).
    n_docs, avgdl : corpus stats (see :mod:`sparkfts.stats`).
    mode : "and" (conjunctive, reference semantics) or "or".

    Plan shape (scale-notes inline):
      tokens ⋈ BROADCAST(query terms)        -- no shuffle; term filter is
                                              -- a broadcast semi-join, and
                                              -- Catalyst pushes nothing to
                                              -- scan here (tokens is derived)
      groupBy(query_id, doc_id)              -- the one wide shuffle; key
                                              -- cardinality = candidate docs
      fold sorted per-term scores            -- fixed-order float64 sum
      window top-k per query                 -- candidates only, tiny
    """
    spark = tokens.sparkSession
    analyzed = [(qid, tokenize_query(text), k) for qid, text, k in queries]
    analyzed = [(qid, terms, k) for qid, terms, k in analyzed if terms]
    if not analyzed or n_docs == 0 or avgdl == 0.0:
        return _empty_results(spark)

    all_terms = sorted({t for _, terms, _ in analyzed for t in terms})

    # exact df for the needed terms only (one small agg + collect)
    df_rows = (
        tokens.where(F.col("term").isin(all_terms))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .collect()
    )
    df_map = {r["term"]: r["df"] for r in df_rows}
    idf_map = {t: idf_fn(n_docs, df_map.get(t, 0)) for t in all_terms}

    qterms = spark.createDataFrame(
        [
            (qid, t, len(terms), k)
            for qid, terms, k in analyzed
            for t in terms
        ],
        "query_id int, term string, n_terms int, k int",
    )

    idf_col = F.create_map(
        *[x for t in all_terms for x in (F.lit(t), F.lit(idf_map[t]))]
    )

    k1, b = BM25_K1, BM25_B
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("doclen").cast("double") / F.lit(avgdl)
    )
    tf_d = F.col("tf").cast("double")
    score_t = (
        F.element_at(idf_col, F.col("term"))
        * (tf_d / (tf_d + norm))
        * F.lit(k1 + 1.0)
    )

    matched = (
        tokens.join(F.broadcast(qterms), "term")
        .withColumn("score_t", score_t)
        .groupBy("query_id", "doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("term"), F.col("score_t")))
            ).alias("parts"),
            F.count("*").alias("n_matched"),
            F.first("n_terms").alias("n_terms"),
            F.first("k").alias("k"),
        )
    )
    if mode == "and":
        matched = matched.where(F.col("n_matched") == F.col("n_terms"))
    elif mode != "or":
        raise ValueError(f"unknown mode {mode!r}")

    scored = matched.withColumn(
        "score",
        F.aggregate(
            F.transform(F.col("parts"), lambda x: x["score_t"]),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("k"))
        .select(
            F.col("query_id").cast("int"),
            F.col("rank").cast("int"),
            "doc_id",
            "score",
        )
        .orderBy("query_id", "rank")
    )


def bm25_scan(
    tokens: DataFrame,
    query: str,
    k: int,
    n_docs: int,
    avgdl: float,
    mode: str = "and",
) -> DataFrame:
    """Single-query convenience wrapper -> DataFrame(rank, doc_id, score)."""
    return bm25_scan_batch(tokens, [(0, query, k)], n_docs, avgdl, mode).select(
        "rank", "doc_id", "score"
    )
