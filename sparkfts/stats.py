"""Corpus statistics: N, avgdl, df(term) — BM25's global inputs.

These are the statistics Lucene maintains per segment/field and the
reference consumes implicitly through its ``multi_match`` scoring
(reference ElasticsearchToNeo4jSync.py:92-99, SURVEY.md §2.4).

Skew note (north rule): df(term) follows Zipf — the head term can occur in
~half of all documents. ``groupBy(term).count()`` alone is already safe in
Spark because partial (map-side) aggregation bounds any single reducer's
input at one row per (map task, term); we additionally provide the explicit
two-phase *salted* aggregation form for the grouped paths where partial
aggregation does not apply, and use exact counts only (never
``approx_count_distinct``) on the correctness path (SURVEY.md §7.3).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfts import BM25_B, BM25_K1


def total_tokens(tokens: DataFrame) -> int:
    """Exact corpus token count = sum of tf over distinct (doc, term) rows."""
    row = tokens.agg(F.sum(F.col("tf").cast("long")).alias("t")).collect()[0]
    return int(row["t"] or 0)


def avgdl_of(tokens: DataFrame, n_docs: int) -> float:
    """avgdl = total tokens / N, computed int-exact then divided once.

    Matches the oracle bit-for-bit: both sides divide the exact integer
    token total by the exact integer doc count (including zero-length
    docs) in one float64 operation.
    """
    if n_docs == 0:
        return 0.0
    return total_tokens(tokens) / n_docs


def term_df(tokens: DataFrame, salted: bool = True, n_salts: int = 16) -> DataFrame:
    """Exact document frequency per term -> ``(term, df)``.

    ``tokens`` has one row per distinct (doc_id, term), so df is a plain
    count. ``salted=True`` materializes the two-phase shape explicitly —
    partial counts per (term, salt) with ``salt = pmod(xxhash64(doc_id), S)``,
    then a final per-term sum — the skew-defusing pattern the north rule
    mandates for term-keyed shuffles. (For simple counts Spark's map-side
    partial agg achieves the same effect; the explicit form is the one that
    generalizes to the grouped-map posting build in :mod:`sparkfts.index`.)
    """
    if not salted:
        return tokens.groupBy("term").agg(F.count("*").alias("df"))
    partial = (
        tokens.withColumn(
            "salt", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_salts))
        )
        .groupBy("term", "salt")
        .agg(F.count("*").alias("pdf"))
    )
    return partial.groupBy("term").agg(F.sum("pdf").alias("df"))


def idf(n_docs: int, df: int) -> float:
    """Pinned BM25 idf (float64, identical expression to oracle/bm25.py)."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_consts() -> tuple[float, float]:
    return BM25_K1, BM25_B
