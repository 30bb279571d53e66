"""Filtered and range vector search: ES 8 kNN-with-filter and
radius (similarity-threshold) queries.

ES's ``knn`` clause takes a ``filter``; the crucial pinned semantics
is that the filter applies DURING the search (pre-filter) — the
result is the exact top-k AMONG vectors passing the predicate — not a
post-filter of an unfiltered top-k page, which silently returns fewer
than k hits exactly when the filter is selective.  ES 8.8+ also
exposes a ``similarity`` radius: all vectors within a score threshold.

Both compose the engine's quantized-exact cosine machinery
(sparkfts.ops.similarity: int64-quantized dot/norms — order-free
integer sums, bit-identical across engines and in the DuckDB oracle):

- :func:`cosine_topk_filtered`: predicate -> narrow map ->
  TakeOrdered.  The predicate is a Catalyst expression over the
  embedding table's metadata columns, so it pushes into the parquet
  scan (PushedFilters) — at 10^12 vectors the filter prunes BEFORE
  any arithmetic, the same reason ES pre-filters during graph
  traversal.
- :func:`cosine_range_search`: same scoring map, ``cos >= min_cos``
  predicate instead of a top-k bound.  Result size is data-dependent
  (ES caps radius results with ``size``; the optional ``limit``
  mirrors that).
- :func:`ann_lsh_topk_filtered`: the bucketed serving path — probes
  stay partition-pruned scans of the materialized LSH index; the
  metadata predicate joins in (broadcast, bounded by probed-bucket
  rows) before scoring, preserving the pre-filter contract within
  the probed candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkfts.ops.similarity import np_floor_half, quantize_vec


def _cos_e6(query_vec: list[float], vec_col: str) -> tuple[Column, Column]:
    """(na, cos_e6) columns for the quantized-exact cosine vs the
    query (identical arithmetic to similarity.cosine_topk)."""
    qint = [int(np_floor_half(float(x))) for x in query_vec]
    q = F.array(*[F.lit(v) for v in qint])
    qv = quantize_vec(F.col(vec_col))
    dot = F.aggregate(
        F.zip_with(qv, q, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    na = F.aggregate(
        qv, F.lit(0).cast("long"), lambda acc, v: acc + v * v
    )
    nq = sum(v * v for v in qint)
    cos_e6 = F.floor(
        dot / (F.sqrt(na.cast("double")) * F.sqrt(F.lit(float(nq))))
        * 1_000_000
        + 0.5
    ).cast("long")
    return na, cos_e6


def cosine_topk_filtered(
    emb: DataFrame,
    query_vec: list[float],
    filter_expr: str,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ES kNN with filter (exact brute path) -> (vec_id, cos_e6):
    the top-k among vectors satisfying ``filter_expr`` (pre-filter —
    always k hits when k candidates pass)."""
    na, cos_e6 = _cos_e6(query_vec, vec_col)
    return (
        emb.where(F.expr(filter_expr))
        .select(
            F.col(id_col).alias("vec_id"),
            na.alias("na"),
            cos_e6.alias("cos_e6"),
        )
        .where(F.col("na") > 0)
        .select("vec_id", "cos_e6")
        .orderBy(F.desc("cos_e6"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_range_search(
    emb: DataFrame,
    query_vec: list[float],
    min_cos_e6: int,
    limit: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ES kNN ``similarity`` radius -> every vector with
    ``cos_e6 >= min_cos_e6`` (cos desc, vec_id asc; optional size
    cap)."""
    na, cos_e6 = _cos_e6(query_vec, vec_col)
    out = (
        emb.select(
            F.col(id_col).alias("vec_id"),
            na.alias("na"),
            cos_e6.alias("cos_e6"),
        )
        .where((F.col("na") > 0) & (F.col("cos_e6") >= int(min_cos_e6)))
        .select("vec_id", "cos_e6")
        .orderBy(F.desc("cos_e6"), F.asc("vec_id"))
    )
    return out.limit(limit) if limit is not None else out


def ann_lsh_topk_filtered(
    spark,
    ann_dir: str,
    emb: DataFrame,
    query_vec: list[float],
    filter_expr: str,
    k: int = 10,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
) -> DataFrame:
    """Filtered kNN on the materialized LSH index: partition-pruned
    probe scan -> metadata join (bounded by probed rows) -> predicate
    -> exact cosine top-k within the probed candidates."""
    from sparkfts.ops.similarity import (
        probe_buckets,
        query_bucket,
        read_ann_meta,
    )

    n_planes = read_ann_meta(ann_dir)["n_planes"]
    qb = query_bucket(query_vec, n_planes)
    buckets = probe_buckets(qb, n_planes, probe_hamming)
    cand = spark.read.parquet(ann_dir).where(
        F.col("bucket").isin(buckets)
    )
    meta_cols = emb.select(
        F.col(id_col).alias("vec_id"),
        *[c for c in emb.columns if c not in (id_col, "embedding")],
    )
    cand = cand.join(meta_cols, "vec_id")
    na, cos_e6 = _cos_e6(query_vec, "embedding")
    return (
        cand.where(F.expr(filter_expr))
        .select(
            F.col("vec_id"),
            na.alias("na"),
            cos_e6.alias("cos_e6"),
        )
        .where(F.col("na") > 0)
        .select("vec_id", "cos_e6")
        .orderBy(F.desc("cos_e6"), F.asc("vec_id"))
        .limit(k)
    )
