"""ES ``sparse_vector`` retrieval (ELSER-style learned sparse ranking).

ES 8.x stores learned sparse representations — a map of term ->
weight per document (``sparse_vector`` field, produced by models like
ELSER) — and ranks by the dot product between the query's term-weight
map and each document's. The engine's dense family (exact / LSH / IVF
/ SQ8 / PQ / BBQ, sparkfts.ops.similarity) covers embeddings; this
module covers the sparse half of hybrid retrieval.

Spark-first shape — a sparse index IS an inverted index of weights:

- **storage**: ``(term, doc_id, weight)`` rows partitioned by a term
  bucket (the engine's sha1-prefix ``term_bucket`` family), written
  sorted so term predicates row-group-prune.
- **query**: the query map becomes a broadcast literal frame; ONE
  equi-join on term (only the query's terms leave the scan — predicate
  pushdown on the ``IN`` list), then a partially-aggregated
  ``groupBy(doc_id).sum(qw * dw)`` and a distributed TakeOrdered
  top-k. No kernel, no UDF — the whole query is three Catalyst nodes.

Weights are integer-quantized at build time (ES stores bfloat16-ish
precision; the pin here is e3 integers) so the dot product is exact
int64 arithmetic — deterministic cross-engine, overflow-safe up to
~10^6 terms x 10^6-scale weights per doc.

No model runs in this container: :func:`tf_sparse_vectors` derives a
deterministic bag-of-words weighting (tf over the pinned analyzer,
top-``m`` terms per doc) as the test/bench stand-in; a real ELSER
export plugs into :func:`write_sparse_index` unchanged.
"""

from __future__ import annotations

import os
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SPARSE_DIR = "sparse"


def tf_sparse_vectors(
    docs: DataFrame, text_col: str = "text", top_m: int = 32
) -> DataFrame:
    """Deterministic sparse vectors: per doc the ``top_m`` terms by
    (tf desc, term asc) with weight = tf * 1000 (the e3 integer pin).
    Stand-in for a learned-sparse model's export."""
    from pyspark.sql import Window

    from sparkfts.ops.textstats import tokens_col

    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("term")
    )
    return (
        tf.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_m)
        .select(
            "doc_id", "term",
            (F.col("tf") * 1000).cast("long").alias("weight"),
        )
    )


def write_sparse_index(
    vectors: DataFrame, index_dir: str, n_tbuckets: int = 16
) -> str:
    """Persist ``(doc_id, term, weight)`` rows bucketed + sorted by
    term so query-term predicates partition- and row-group-prune."""
    from sparkfts.storage import write_table

    out = os.path.join(index_dir, SPARSE_DIR)
    # JVM spelling of index.term_bucket: first 4 sha1 bytes, big-endian
    tb = (
        F.conv(F.substring(F.sha1(F.col("term")), 1, 8), 16, 10)
        .cast("long") % n_tbuckets
    ).cast("int")
    df = vectors.withColumn("tbucket", tb)
    write_table(
        df.repartition(n_tbuckets, "tbucket").sortWithinPartitions(
            "tbucket", "term", "doc_id"
        ),
        out,
        partition_by=["tbucket"],
    )
    return out


def sparse_vector_topk(
    spark: SparkSession,
    index_dir: str,
    query_weights: dict[str, float],
    k: int = 10,
    n_tbuckets: int = 16,
) -> DataFrame:
    """ES sparse_vector query -> (rank, doc_id, dot) with ``dot`` the
    exact integer dot product (query weights e3-quantized like the
    stored side). Ties: dot desc, doc_id asc."""
    if not query_weights:
        raise ValueError("query_weights must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    from sparkfts.index import in_list, term_bucket

    path = os.path.join(index_dir, SPARSE_DIR)
    if not os.path.isdir(path):
        raise ValueError(
            f"no sparse index at {path}; run write_sparse_index"
        )
    qrows = [
        (t, int(round(float(w) * 1000)))
        for t, w in sorted(query_weights.items())
    ]
    qdf = spark.createDataFrame(qrows, "term string, qw long")
    buckets = sorted({term_bucket(t, n_tbuckets) for t, _ in qrows})
    stored = spark.read.parquet(path).where(
        in_list("tbucket", buckets)
        & in_list("term", [t for t, _ in qrows])
    )
    scored = (
        stored.join(F.broadcast(qdf), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("weight") * F.col("qw")).alias("dot"))
    )
    top = scored.orderBy(F.desc("dot"), F.asc("doc_id")).limit(int(k))
    w = Window.orderBy(F.desc("dot"), F.asc("doc_id"))  # <= k rows
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", F.col("dot").cast("long").alias("dot")
    )
