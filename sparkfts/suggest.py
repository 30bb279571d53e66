"""ES term suggester ("did you mean") over the index term dictionary.

The reference's ES backend ships `_search` suggesters on the same term
dictionary Lucene keeps for fuzzy queries (reference
ElasticsearchHandler.py:69 — one `client.search` away). Pinned spec
(executable in the DuckDB oracle of ``__spark_entry__.term_suggest``):

  - input text is analyzed with the pinned analyzer;
  - per input term, candidates are dictionary terms within
    ``auto_fuzz(term)`` edits (the same AUTO ladder as fuzzy queries),
    EXCLUDING the input term itself (ES returns corrections, not echoes);
  - ordering pins ES's term-suggester sort: distance asc, then document
    frequency desc, then term asc; top ``size`` per input term.

Plan: the same distributed Levenshtein join as fuzzy expansion — the
(never-collected) terms dictionary against the broadcast input-term
list, with a pushed term-length window pre-filter; only the top
suggestions come back to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkfts.analysis import auto_fuzz, tokenize


def suggest_terms(
    spark: SparkSession,
    index_dir: str,
    text: str,
    size: int = 5,
) -> DataFrame:
    """-> (input_term, suggestion, dist, df, rank), rank 1..size per
    input term in the pinned (dist asc, df desc, term asc) order."""
    from sparkfts.index import load_terms

    qterms = sorted(set(tokenize(text)))
    if not qterms:
        return spark.createDataFrame(
            [], "input_term string, suggestion string, dist int, df long, "
                "rank int"
        )
    qrows = [(t, auto_fuzz(t), len(t)) for t in qterms]
    qdf = spark.createDataFrame(qrows, "q_term string, maxd int, qlen int")
    lmin = min(ln - d for _, d, ln in qrows)
    lmax = max(ln + d for _, d, ln in qrows)
    terms = load_terms(spark, index_dir).where(
        F.length("term").between(F.lit(lmin), F.lit(lmax))
    )
    dist = F.levenshtein(F.col("term"), F.col("q_term"))
    w = Window.partitionBy("input_term").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("suggestion")
    )
    return (
        terms.join(
            F.broadcast(qdf),
            (F.abs(F.length("term") - F.col("qlen")) <= F.col("maxd"))
            & (F.col("term") != F.col("q_term"))
            & (F.levenshtein(F.col("term"), F.col("q_term")) <= F.col("maxd")),
        )
        .select(
            F.col("q_term").alias("input_term"),
            F.col("term").alias("suggestion"),
            dist.cast("int").alias("dist"),
            F.col("df").cast("long").alias("df"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(int(size)))
        .orderBy("input_term", "rank")
    )
