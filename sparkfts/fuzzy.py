"""Fuzzy (``fuzziness: AUTO``) BM25 matching on Spark.

The reference's search DSL always requests fuzzy matching
(``multi_match ... fuzziness: "AUTO"``, reference
ElasticsearchToNeo4jSync.py:97) and delegates it to Elasticsearch. Here it
is rebuilt natively (SURVEY.md §2.7): each query term is expanded against
the corpus term dictionary with a Levenshtein join, then scored with the
best-expansion-wins BM25 variant pinned by :mod:`oracle.fuzzy`.

Plan shape (scale notes inline):

  term dictionary + df      -- groupBy(term).count over distinct-pair
                             -- tokens: map-side partial agg bounds skew
  dict ⋈ BROADCAST(qterms)  -- expansion join; the length pre-filter
                             -- (|len(t')-len(t)| <= maxd) prunes most of
                             -- the dictionary before the O(len^2)
                             -- levenshtein evaluates; qterms is tiny so
                             -- this is a broadcast nested-loop over the
                             -- *dictionary* (|dict| ~ 10^7-10^8 at web
                             -- scale, partitioned — never collected)
  tokens ⋈ BROADCAST(expansions)  -- expansions are few thousand rows max
  groupBy(query_id, doc_id, q_term).max  -- best expansion per clause
  groupBy(query_id, doc_id)  -- fold clause contributions in sorted
                             -- q_term order (deterministic float64 sum)
  window top-k per query

Determinism: ``max`` over float64 is order-independent; the final
per-clause fold is in sorted-q_term order via
``F.aggregate(sort_array(...))`` — bit-identical to the oracle loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkfts import BM25_B, BM25_K1
from sparkfts.analysis import auto_fuzz, tokenize_query
from sparkfts.query import RESULT_SCHEMA


def _empty(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], RESULT_SCHEMA)


def expand_query_terms(
    term_df: DataFrame,
    queries_analyzed: list[tuple[int, list[str], int]],
    transpositions: bool = False,
    prefix_length: int = 0,
) -> DataFrame:
    """Levenshtein-expand query terms against the term dictionary.

    term_df : DataFrame(term, df) — the corpus term dictionary with exact
    document frequencies (never collected to the driver).
    Returns DataFrame(query_id, q_term, term, boost, df).

    ``transpositions``: ES ``fuzzy_transpositions`` — distance becomes
    unrestricted Damerau-Levenshtein. The JVM join keeps a sound
    ``lev <= 2*maxd`` pre-filter; the exact Damerau distance refines the
    (tiny) survivor set via an Arrow-batched pandas UDF, so the
    dictionary itself is still never collected (:mod:`sparkfts.editdist`).
    """
    from sparkfts.editdist import damerau_udf, fuzzy_join_cond

    spark = term_df.sparkSession
    pl = max(0, int(prefix_length))
    rows = [
        (qid, t, auto_fuzz(t), len(t), t[:pl])
        for qid, terms, _ in queries_analyzed
        for t in terms
    ]
    qdf = spark.createDataFrame(
        rows,
        "query_id int, q_term string, maxd int, qlen int, q_prefix string",
    )
    jcond = fuzzy_join_cond(transpositions=transpositions)
    if pl > 0:
        # ES fuzzy prefix_length: edits only beyond the first pl chars
        jcond = jcond & F.col("term").startswith(F.col("q_prefix"))
    joined = term_df.join(F.broadcast(qdf), jcond)
    if transpositions:
        dist = damerau_udf(F.col("term"), F.col("q_term")).cast("int")
        joined = joined.withColumn("dist", dist).where(
            F.col("dist") <= F.col("maxd")
        )
    else:
        joined = joined.withColumn(
            "dist", F.levenshtein(F.col("term"), F.col("q_term"))
        )
    return (
        joined.withColumn(
            "boost",
            F.lit(1.0)
            - F.col("dist").cast("double") / F.col("qlen").cast("double"),
        )
        .select("query_id", "q_term", "term", "boost", "df")
    )


def bm25_fuzzy_scan_batch(
    tokens: DataFrame,
    queries: list[tuple[int, str, int]],
    n_docs: int,
    avgdl: float,
    mode: str = "and",
    transpositions: bool = False,
    prefix_length: int = 0,
) -> DataFrame:
    """Fuzzy BM25 top-k for a batch of queries in one Spark plan.

    tokens : DataFrame(doc_id, term, tf, doclen); queries: (qid, text, k).
    Semantics pinned by :func:`oracle.fuzzy.fuzzy_search`.
    """
    spark = tokens.sparkSession
    analyzed = [(qid, tokenize_query(text), k) for qid, text, k in queries]
    analyzed = [(qid, terms, k) for qid, terms, k in analyzed if terms]
    if not analyzed or n_docs == 0 or avgdl == 0.0:
        return _empty(spark)

    term_df = tokens.groupBy("term").agg(F.count("*").alias("df"))
    expansions = expand_query_terms(
        term_df, analyzed, transpositions, prefix_length=prefix_length
    )

    meta = spark.createDataFrame(
        [(qid, len(terms), k) for qid, terms, k in analyzed],
        "query_id int, n_terms int, k int",
    )

    k1, b = BM25_K1, BM25_B
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("doclen").cast("double") / F.lit(avgdl)
    )
    tf_d = F.col("tf").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    contrib = F.col("boost") * idf * (tf_d / (tf_d + norm)) * F.lit(k1 + 1.0)

    best = (
        tokens.join(F.broadcast(expansions), "term")
        .withColumn("contrib", contrib)
        .groupBy("query_id", "doc_id", "q_term")
        .agg(F.max("contrib").alias("best"), F.first("doclen").alias("doclen"))
    )

    scored = (
        best.groupBy("query_id", "doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("q_term"), F.col("best")))
            ).alias("parts"),
            F.count("*").alias("n_matched"),
        )
        .join(F.broadcast(meta), "query_id")
        .withColumn(
            "score",
            F.aggregate(
                F.transform(F.col("parts"), lambda x: x["best"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    if mode == "and":
        scored = scored.where(F.col("n_matched") == F.col("n_terms"))
    elif mode != "or":
        raise ValueError(f"unknown mode {mode!r}")

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
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


def bm25_fuzzy_scan(
    tokens: DataFrame,
    query: str,
    k: int,
    n_docs: int,
    avgdl: float,
    mode: str = "and",
    transpositions: bool = False,
    prefix_length: int = 0,
) -> DataFrame:
    """Single-query wrapper -> DataFrame(rank, doc_id, score)."""
    return bm25_fuzzy_scan_batch(
        tokens, [(0, query, k)], n_docs, avgdl, mode, transpositions
    ).select("rank", "doc_id", "score")
