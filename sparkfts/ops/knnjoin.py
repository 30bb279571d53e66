"""kNN JOIN: for every vector of table A, its k nearest in table B.

Single-query ANN (ops/similarity) answers "neighbors of THIS vector";
dataset curation needs the batch form — semantic dedup (SemDeDup-style:
each doc's nearest kept-set neighbor), embedding-level test-set
decontamination (each eval item's nearest training doc), label
propagation — i.e. a JOIN where every left row retrieves from the
right table.

Two paths, one contract (``(a_id, rank, b_id, cos_e6)``, cosine via
the quantized-e3 integer arithmetic shared with ``cosine_topk``, ties
``b_id`` asc):

- ``method='exact'``: the all-pairs join — |A| x |B| comparisons.
  Correct at any recall, quadratic cost; the oracle/baseline path.
- ``method='lsh'``: both sides bucket with the SAME integer-LCG
  random-hyperplane family (ops/similarity.lsh_bucket — reproducible
  in any engine), the join runs per bucket, and each left row keeps
  its top-k within colliding candidates. Recall < 1 by construction
  (LSH candidate semantics, like dedup's band join) but the cost is
  sum over buckets of |A_b| x |B_b| — the 10^9 x 10^9 shape. Raise
  recall by lowering ``n_planes`` (bigger buckets) exactly like the
  dedup family.

The per-left-key top-k is a window PARTITIONED by ``a_id`` (per-key
state only); no global funnel anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkfts.ops.similarity import lsh_bucket, quantize_vec


def _quantized_side(
    df: DataFrame, id_col: str, vec_col: str, out_id: str, out_vec: str,
    out_norm: str
) -> DataFrame:
    """Quantize + norm ONCE per row (columnar), so the per-pair work
    below is a single dot product — norms/quantization must never be
    recomputed per pair (pairs >> rows by construction)."""
    q = quantize_vec(F.col(vec_col))
    nsq = F.aggregate(q, F.lit(0).cast("long"), lambda acc, v: acc + v * v)
    return df.select(
        F.col(id_col).alias(out_id),
        q.alias(out_vec),
        nsq.alias(out_norm),
    )


def _paired_cos_e6(qa: str, qb: str, na: str, nb: str) -> F.Column:
    """Exact quantized-e3 cosine from PRE-quantized vectors + norms ->
    cos_e6 (BIGINT), the engine-wide embedding arithmetic pin."""
    dot = F.aggregate(
        F.zip_with(F.col(qa), F.col(qb), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return F.when(
        (F.col(na) > 0) & (F.col(nb) > 0),
        F.floor(
            dot
            / (
                F.sqrt(F.col(na).cast("double"))
                * F.sqrt(F.col(nb).cast("double"))
            )
            * 1_000_000
            + 0.5
        ).cast("long"),
    )


def knn_join(
    a: DataFrame,
    b: DataFrame,
    k: int = 3,
    method: str = "lsh",
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    bucket_cap: int | None = None,
) -> DataFrame:
    """-> ``(a_id, rank, b_id, cos_e6)``: each A row's k nearest B rows
    (among LSH candidates when ``method='lsh'``). ``exclude_self``
    drops identical-id pairs (the self-join case A is B).

    ``bucket_cap`` (round-4 VERDICT hot-bucket guard, lsh only): a
    boilerplate cluster of B near-identical vectors lands in ONE bucket,
    so the per-bucket A x B join there is O(B^2).  With a cap, only the
    first ``bucket_cap`` RIGHT-side rows per bucket (``row_number()`` on
    b_id asc — deterministic) serve as candidates; every left row still
    retrieves, but from at most cap colliding candidates per bucket.
    Recall trade, documented: a left row's true neighbor beyond the cap
    in every shared bucket is missed — collapse exact duplicates on the
    right side first so capped rows are near-dup stragglers."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if method not in ("exact", "lsh"):
        raise ValueError("method must be 'exact' or 'lsh'")
    left = _quantized_side(a, id_col, vec_col, "a_id", "__qa", "__na")
    right = _quantized_side(b, id_col, vec_col, "b_id", "__qb", "__nb")
    if method == "exact":
        pairs = left.crossJoin(right)  # documented quadratic baseline
    else:
        ab = lsh_bucket(a, n_planes, id_col, vec_col).withColumnRenamed(
            "vec_id", "a_id"
        )
        bb = lsh_bucket(b, n_planes, id_col, vec_col).withColumnRenamed(
            "vec_id", "b_id"
        )
        if bucket_cap is not None:
            w = Window.partitionBy("bucket").orderBy("b_id")
            bb = (
                bb.withColumn("__pos", F.row_number().over(w))
                .where(F.col("__pos") <= int(bucket_cap))
                .drop("__pos")
            )
        pairs = (
            left.join(ab, "a_id")
            .join(bb.join(right, "b_id"), "bucket")
            .select("a_id", "__qa", "__na", "b_id", "__qb", "__nb")
        )
    if exclude_self:
        pairs = pairs.where(F.col("a_id") != F.col("b_id"))
    scored = pairs.select(
        "a_id", "b_id",
        _paired_cos_e6("__qa", "__qb", "__na", "__nb").alias("cos_e6"),
    ).where(F.col("cos_e6").isNotNull())
    w = Window.partitionBy("a_id").orderBy(
        F.desc("cos_e6"), F.asc("b_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("a_id", "rank", "b_id", "cos_e6")
        .orderBy("a_id", "rank")
    )


def semdedup(
    emb: DataFrame,
    threshold_e6: int = 950_000,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
    bucket_cap: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023 shape): semantic dedup by embedding
    — near-identical vectors cluster, one representative per cluster
    survives. -> ``(vec_id, cluster_id, is_canonical)``; downstream
    keeps ``is_canonical`` rows.

    Composition of the engine's existing scale-safe pieces, no new
    kernels: LSH-bucketed near-dup pairs at ``threshold_e6``
    (ops/similarity.embedding_dup_pairs, never all-pairs) -> connected
    components via path-doubled min-label propagation
    (ops/dedup.duplicate_clusters, O(log diameter) rounds). Singletons
    (no near neighbor) are canonical by definition — every input id
    appears exactly once in the output.

    Hot-bucket guard (round-4 VERDICT fix #1): pair generation runs over
    one REPRESENTATIVE per distinct quantized vector, not over raw rows.
    The engine's cosine is a pure function of the quantized-e3 vector,
    so rows with identical quantized vectors (web boilerplate: 10^4-10^6
    byte-identical pages -> identical embeddings) are interchangeable in
    the pair graph: cos(identical, identical) = 1e6 >= any threshold
    makes each identity group a clique, and any member edge is mirrored
    by the rep edge.  Collapsing to reps before LSH is therefore
    LOSSLESS — output clusters are bit-identical to raw pairing — while
    the dominant blowup (exact-copy floods) costs 1 row per distinct
    vector instead of O(B^2) pairs.  Zero vectors never pair (guard in
    embedding_dup_pairs) so each keeps a unique key.  For floods of
    near-identical-but-DISTINCT vectors, thread ``bucket_cap`` (per-LSH-
    bucket fan-out cap over reps; documented recall trade in
    ops/similarity.embedding_dup_pairs).
    """
    from sparkfts.ops.dedup import duplicate_clusters
    from sparkfts.ops.similarity import embedding_dup_pairs, quantize_vec

    nsq = F.aggregate(
        quantize_vec(F.col(vec_col)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v * v,
    )
    # collapse is valid only while identical vectors actually pair
    # (cos(x, x) = 1e6 >= threshold); above that nothing pairs at all,
    # so every id keys itself (degenerate config, kept exact)
    qkey = F.when(
        (nsq > 0) & F.lit(int(threshold_e6) <= 1_000_000),
        F.md5(
            F.array_join(
                F.transform(
                    quantize_vec(F.col(vec_col)), lambda x: x.cast("string")
                ),
                ",",
            )
        ),
    ).otherwise(F.concat(F.lit("z"), F.col(id_col).cast("string")))
    members = emb.select(
        F.col(id_col).alias("vec_id"), qkey.alias("__qkey")
    ).cache()
    # adaptive: the rep machinery (groupBy + two joins) only pays for
    # itself when exact duplicates exist; one cheap distinct-count agg
    # decides (a flood-free corpus keeps the direct path's cost)
    counts = members.agg(
        F.count("*").alias("n"),
        F.count_distinct("__qkey").alias("n_keys"),
    ).collect()[0]
    if int(counts["n"]) == int(counts["n_keys"]):
        members.unpersist()
        pairs = embedding_dup_pairs(
            emb, threshold_e6=threshold_e6, id_col=id_col,
            vec_col=vec_col, bucketed=True, n_planes=n_planes,
            bucket_cap=bucket_cap,
        ).select("id_a", "id_b")
        clustered = duplicate_clusters(
            pairs, a_col="id_a", b_col="id_b",
            checkpoint_dir=checkpoint_dir,
        )
        ids = emb.select(F.col(id_col).alias("vec_id"))
        out = ids.join(
            clustered.withColumnRenamed("doc_id", "vec_id"), "vec_id",
            "left",
        )
        return out.select(
            "vec_id",
            F.coalesce(F.col("cluster_id"), F.col("vec_id")).alias(
                "cluster_id"
            ),
            F.coalesce(F.col("is_canonical"), F.lit(True)).alias(
                "is_canonical"
            ),
        ).orderBy("vec_id")
    reps = members.groupBy("__qkey").agg(F.min("vec_id").alias("__rep"))
    members_rep = members.join(reps, "__qkey").select("vec_id", "__rep")
    rep_rows = emb.join(
        members_rep.where(F.col("vec_id") == F.col("__rep")).select(
            F.col("vec_id").alias(id_col) if id_col != "vec_id" else "vec_id"
        ),
        id_col,
    )
    pairs = embedding_dup_pairs(
        rep_rows, threshold_e6=threshold_e6, id_col=id_col, vec_col=vec_col,
        bucketed=True, n_planes=n_planes, bucket_cap=bucket_cap,
    ).select("id_a", "id_b")
    clustered = duplicate_clusters(
        pairs, a_col="id_a", b_col="id_b", checkpoint_dir=checkpoint_dir
    )
    out = members_rep.join(
        clustered.withColumnRenamed("doc_id", "__rep"), "__rep", "left"
    )
    return out.select(
        "vec_id",
        F.coalesce(F.col("cluster_id"), F.col("__rep")).alias("cluster_id"),
    ).withColumn(
        "is_canonical", F.col("vec_id") == F.col("cluster_id")
    ).orderBy("vec_id")
