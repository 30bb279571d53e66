"""Hybrid retrieval: Reciprocal Rank Fusion of lexical (BM25) and
vector (cosine ANN) rankings.

ES 8's hybrid search fuses a ``query`` (BM25) leg and a ``knn`` leg with
RRF (the reference's deployment delegates all retrieval to one
``client.search`` call, reference ElasticsearchHandler.py:69; RRF is the
standard way that call is extended once a vector field exists):

    rrf_score(d) = sum_i  w_i / (rrf_k + rank_i(d))

over every ranking ``i`` in which ``d`` appears (ES default
``rrf_k = 60``, ``rank_window_size`` = the per-leg candidate depth).

Scale shape: the fuse operates on the LEGS' OUTPUTS — per-query top-N
candidate lists (``n_queries x depth`` rows), never the corpora — so it
is one tiny groupBy + window regardless of index size. Each leg keeps
its own scale path (block-max WAND kernels for BM25, bucket-pruned LSH /
IVF for ANN); fusion adds no scan and no wide shuffle.

Determinism: contributions are folded in ascending ``system`` index
order (sorted fold, same device as querybuilder's should-sum), so the
float64 total is reproducible and engine-portable; final ties are pinned
``(-score, doc_id asc)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    weights: list[float] | None = None,
) -> DataFrame:
    """Fuse per-query rankings -> DataFrame(query_id, rank, doc_id,
    rrf_score).

    Each input DataFrame must have columns ``query_id``, ``rank`` (1-based
    within that system), ``doc_id``. A doc absent from a system simply
    contributes nothing for it (standard RRF).
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError("weights must align with rankings")
    parts = [
        df.select(
            F.col("query_id").cast("int"),
            F.col("doc_id").cast("long"),
            F.lit(i).alias("system"),
            (
                F.lit(float(w))
                / (F.lit(int(rrf_k)) + F.col("rank").cast("double"))
            ).alias("contrib"),
        )
        for i, (df, w) in enumerate(zip(rankings, weights))
    ]
    from functools import reduce

    allc = reduce(lambda a, b: a.unionByName(b), parts)
    # sorted fold over (system, contrib): deterministic float64 sum
    fused = allc.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("system"), F.col("contrib")))
                ),
                lambda x: x["contrib"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(int(k)))
        .select("query_id", F.col("rank").cast("int"), "doc_id", "rrf_score")
    )


def hybrid_rrf_topk(
    spark,
    index_dir: str,
    emb: DataFrame,
    queries: list[tuple[int, str, list[float]]],
    k: int = 10,
    depth: int = 100,
    rrf_k: int = 60,
    mode: str = "or",
) -> DataFrame:
    """End-to-end hybrid search: BM25 leg over a built index + exact
    cosine leg over an embedding table, fused with RRF ->
    DataFrame(query_id, rank, doc_id, rrf_score).

    ``queries``: (query_id, text, query_vector) triples; ``depth`` is
    ES's ``rank_window_size`` (per-leg candidate depth). ``emb`` must
    have (vec_id, embedding) with vec_id keyed like the index's doc_id.
    For billion-vector corpora swap the exact cosine leg for
    :func:`sparkfts.ops.similarity.ann_index_topk` (bucket-pruned scan)
    — the fuse is leg-agnostic.
    """
    from functools import reduce

    from sparkfts.ops.similarity import cosine_topk
    from sparkfts.query import bm25_index_batch

    bm25 = bm25_index_batch(
        spark, index_dir, [(qid, text, depth) for qid, text, _ in queries],
        mode=mode,
    ).select("query_id", "rank", "doc_id")
    ann_rank = Window.orderBy(F.desc("cos_e6"), F.asc("vec_id"))
    ann_parts = [
        cosine_topk(emb, list(qvec), k=depth)
        .withColumn("rank", F.row_number().over(ann_rank))
        .select(
            F.lit(int(qid)).alias("query_id"),
            F.col("rank"),
            F.col("vec_id").alias("doc_id"),
        )
        for qid, _, qvec in queries
    ]
    ann = reduce(lambda a, b: a.unionByName(b), ann_parts)
    return rrf_fuse([bm25, ann], k=k, rrf_k=rrf_k)
