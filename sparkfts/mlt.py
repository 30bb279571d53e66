"""ES ``more_like_this``: find documents similar to a given document.

Pinned spec (mirrored by the DuckDB oracle in
``__spark_entry__.more_like_this``), following ES's MLT construction:

  1. take the source doc's analyzed terms with their term frequencies
     (from the corpus table — ES reads stored term vectors; the pruned
     one-doc scan here is the storage-agnostic equivalent);
  2. keep terms with ``tf >= min_term_freq`` and corpus
     ``df >= min_doc_freq`` (df from the terms dictionary);
  3. rank by interestingness ``tf * idf`` (idf = the engine's pinned
     BM25 idf), ties by term asc; keep the top ``max_query_terms``;
  4. run a disjunctive BM25 query with those terms and return the
     top-k, EXCLUDING the source document itself (ES's include=false
     default). Exclusion is exact: the engine fetches k+1 and drops the
     source, which can displace at most that one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfts.stats import idf as idf_fn


def mlt_query_terms(
    spark: SparkSession,
    index_dir: str,
    pages: DataFrame,
    doc_id: int,
    max_query_terms: int = 10,
    min_term_freq: int = 1,
    min_doc_freq: int = 2,
    text_col: str = "text",
) -> list[str]:
    """The pinned MLT term selection -> terms in rank order."""
    from sparkfts.index import load_terms, read_meta
    from sparkfts.tokens import tokenize_docs

    meta = read_meta(index_dir)
    one = pages.where(F.col("doc_id") == int(doc_id))
    tf_rows = (
        tokenize_docs(one.select("doc_id", F.col(text_col).alias("text")))
        .select("term", "tf")
        .collect()
    )
    tf_map = {
        r["term"]: int(r["tf"])
        for r in tf_rows
        if int(r["tf"]) >= int(min_term_freq)
    }
    if not tf_map:
        return []
    df_rows = (
        load_terms(spark, index_dir)
        .where(F.col("term").isin(sorted(tf_map)))
        .select("term", "df")
        .collect()
    )
    df_map = {r["term"]: int(r["df"]) for r in df_rows}
    scored = [
        (t, tf_map[t] * idf_fn(meta["n_docs"], df_map[t]))
        for t in tf_map
        if df_map.get(t, 0) >= int(min_doc_freq)
    ]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return [t for t, _ in scored[: int(max_query_terms)]]


def more_like_this(
    spark: SparkSession,
    index_dir: str,
    pages: DataFrame,
    doc_id: int,
    k: int = 10,
    max_query_terms: int = 10,
    min_term_freq: int = 1,
    min_doc_freq: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """-> (rank, doc_id, score): docs most similar to ``doc_id``."""
    from sparkfts.query import _empty_results, bm25_index_batch

    terms = mlt_query_terms(
        spark, index_dir, pages, doc_id,
        max_query_terms, min_term_freq, min_doc_freq, text_col,
    )
    if not terms:
        return _empty_results(spark).select("rank", "doc_id", "score")
    res = bm25_index_batch(
        spark, index_dir, [(0, " ".join(terms), k + 1)], mode="or"
    ).where(F.col("doc_id") != int(doc_id))
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        res.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(int(k)))
        .select("rank", "doc_id", "score")
        .orderBy("rank")
    )
