"""Domain-mixture shaping: hit a target per-group token mix exactly
(the "data mixing" stage of a pretraining pipeline).

Given target weights per group (language, source, domain cluster) and
a total token budget, compute each group's keep-rate and emit the
deterministically sampled corpus. This is the step after curation in
every published pretraining recipe (the Pile/ROOTS/Dolma-style mixture
tables): oversampled domains are thinned, the rest pass through —
upsampling (weight > available) is reported, never silently clipped.

Two Spark jobs, both bounded:

1. ``mixture_plan``: ONE partially-aggregated groupBy computes
   per-group token counts (rows = distinct groups — tiny), then the
   keep-rates are pure driver arithmetic on that bounded frame:
   ``rate_g = min(1, budget * weight_g / tokens_g)`` in integer
   per-mille (rates quantized to 1/1000 — the sampling hash's
   resolution, so the plan IS what the sampler executes).
2. ``apply_mixture``: a rowwise integer-LCG keep predicate per group
   (the :mod:`sparkfts.ops.sampling` hash family — no RNG, no shuffle,
   replayable and cluster-size-invariant), rates joined in via one
   broadcast of the bounded plan.

The achieved mix tracks the target to sampling noise; the plan frame
reports target vs expected tokens per group so the pipeline can assert
tolerances before burning compute on the big pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfts.ops.sampling import HASH_A, HASH_B, HASH_P


def mixture_plan(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    group_col: str = "source",
    token_col: str = "n_tokens",
) -> DataFrame:
    """-> one row per group: ``(group, tokens_available, weight,
    target_tokens, keep_permille, expected_tokens, undersupplied)``.

    Groups absent from ``weights`` get weight 0 (dropped); a group
    whose available tokens fall short of its target keeps everything
    and is flagged ``undersupplied`` (ES-style fail-visible, the
    caller decides whether to upsample elsewhere).
    """
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    if not weights:
        raise ValueError("weights must be non-empty")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    avail = docs.groupBy(F.col(group_col).alias("group")).agg(
        F.sum(F.col(token_col)).cast("long").alias("tokens_available")
    )
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(k, float(v) / total_w) for k, v in sorted(weights.items())],
        "group string, weight double",
    )
    j = avail.join(wdf, "group", "left").na.fill({"weight": 0.0})
    target = F.floor(F.lit(float(token_budget)) * F.col("weight")).cast(
        "long"
    )
    j = j.withColumn("target_tokens", target)
    # integer per-mille keep rate; rates are driver-free (stay in the
    # bounded frame) and quantized to the sampler's resolution
    rate = F.least(
        F.lit(1000).cast("long"),
        F.floor(
            F.col("target_tokens") * 1000
            / F.greatest(F.col("tokens_available"), F.lit(1))
        ).cast("long"),
    )
    j = j.withColumn("keep_permille", rate)
    j = j.withColumn(
        "expected_tokens",
        (F.col("tokens_available") * F.col("keep_permille") / 1000).cast(
            "long"
        ),
    )
    j = j.withColumn(
        "undersupplied", F.col("tokens_available") < F.col("target_tokens")
    )
    return j.orderBy("group")


def apply_mixture(
    docs: DataFrame,
    plan: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sample ``docs`` per the plan's ``keep_permille`` rates: keep doc
    iff ``lcg_hash(doc_id) % 1000 < keep_permille`` — the
    :mod:`sparkfts.ops.sampling` integer hash, so the keep set is
    engine-reproducible and independent of partitioning. The plan frame
    (one row per group) broadcasts."""
    rates = plan.select(
        F.col("group").alias("__g"), "keep_permille"
    )
    h = F.pmod(F.col(id_col).cast("long"), F.lit(HASH_P))
    bucket = F.pmod(
        h * F.lit(HASH_A) + F.lit(HASH_B), F.lit(HASH_P)
    ) % F.lit(1000)
    return (
        docs.join(
            F.broadcast(rates), docs[group_col] == rates["__g"], "inner"
        )
        .where(bucket < F.col("keep_permille"))
        .drop("__g", "keep_permille")
    )
