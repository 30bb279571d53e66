"""Corpus text analysis: per-doc tf-idf keywords and PMI collocations.

Two classic corpus-mining ops a webtext pipeline runs right after
indexing (doc tagging / topic seeds; phrase-vocabulary discovery for
tokenizers and synonym lists):

- :func:`tfidf_keywords`: each doc's top-``k`` terms by ``tf * idf``
  with the engine's pinned BM25 idf (``ln(1 + (N - df + 0.5) /
  (df + 0.5))`` — same constant family as every scorer here). Plan:
  one exploded tf groupBy (map-side combined), one df groupBy, a
  broadcast-joined idf lookup, and a window PARTITIONED by doc.
- :func:`collocations`: corpus-level bigram PMI,
  ``ln(N_bi * c_ab / (c_a * c_b))`` over adjacent-token bigrams with a
  min-count floor (PMI is noise below ~5 occurrences). All counts are
  exact int64; ordering is pinned on the INTEGER count (desc) then
  bigram asc, with PMI as a reported value — so cross-engine 1-ulp
  ``ln`` drift can never reorder results.

Both outputs quantize float scores to e6 integers per the driver
contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkfts.ops.textstats import tokens_col


def tfidf_keywords(
    docs: DataFrame, k: int = 5, text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, rank, term, tf, score_e6): each doc's top-k terms by
    tf*idf (ties: term asc)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.count()
    idf = df.select(
        "term",
        F.log(
            1.0
            + (F.lit(float(n_docs)) - F.col("df") + 0.5)
            / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    scored = tf.join(idf, "term").withColumn(
        "score", F.col("tf") * F.col("idf")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "doc_id",
            F.col("rank").cast("int").alias("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.floor(F.col("score") * 1_000_000 + 0.5)
            .cast("long")
            .alias("score_e6"),
        )
        .orderBy("doc_id", "rank")
    )


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    size: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """-> (bigram, count, pmi_e6): top-``size`` adjacent-token bigrams
    by count (desc, bigram asc) with PMI reported. Counts exact int64;
    the ordering never touches a float."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    toks = docs.select(tokens_col(F.col(text_col)).alias("t"))
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(t) - 1, 0)), "
                "i -> concat_ws(' ', t[i-1], t[i]))"
            )
        ).alias("bigram")
    )
    c_ab = bigrams.groupBy("bigram").agg(F.count("*").alias("count"))
    n_bi = bigrams.count()
    unis = docs.select(
        F.explode(tokens_col(F.col(text_col))).alias("term")
    )
    c_u = unis.groupBy("term").agg(F.count("*").alias("cu"))
    parts = c_ab.where(F.col("count") >= min_count).select(
        "bigram", "count",
        F.split(F.col("bigram"), " ")[0].alias("__w1"),
        F.split(F.col("bigram"), " ")[1].alias("__w2"),
    )
    joined = (
        parts.join(c_u.withColumnRenamed("term", "__w1")
                   .withColumnRenamed("cu", "c1"), "__w1")
        .join(c_u.withColumnRenamed("term", "__w2")
              .withColumnRenamed("cu", "c2"), "__w2")
    )
    pmi = F.log(
        F.lit(float(n_bi)) * F.col("count")
        / (F.col("c1").cast("double") * F.col("c2"))
    )
    return (
        joined.select(
            "bigram",
            F.col("count").cast("long").alias("count"),
            F.floor(pmi * 1_000_000 + 0.5).cast("long").alias("pmi_e6"),
        )
        .orderBy(F.desc("count"), F.asc("bigram"))
        .limit(int(size))
    )
