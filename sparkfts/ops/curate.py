"""End-to-end corpus curation funnel: quality filter -> exact dedup ->
near-dup cluster dedup -> decontamination -> sampling, with per-stage
accounting.

Every large-scale pretraining pipeline is this funnel (C4, CCNet,
Gopher/MassiveText, RefinedWeb all publish the same stage diagram with
per-stage retention tables).  The engine already ships each stage as a
first-class oracled operator; this module composes them in the pinned
order and emits the retention table — the artifact a data engineer
actually reports.

Pinned stage order and semantics:

1. ``quality``: keep docs whose :func:`sparkfts.ops.textstats.
   quality_scores` verdict is true (the pinned Gopher-style bounds).
2. ``exact``: md5 content-hash dedup, winner = smallest doc_id per
   hash (keep-first).
3. ``neardup``: MinHash+LSH candidate pairs -> connected components
   (:func:`sparkfts.ops.dedup.duplicate_clusters`) -> keep each
   cluster's smallest doc_id; singletons always survive.
4. ``decontam``: drop docs sharing >= ``min_shared`` distinct
   ``n``-grams with the eval frame (broadcast eval grams).
5. ``sample``: deterministic integer-LCG rate sampling
   (:func:`sparkfts.ops.sampling.stratified_sample`) — replayable.

Stages run lazily as one composed DataFrame chain; the funnel
accounting (`docs_in/docs_out` per stage) costs one count action per
enabled stage — counts ARE the deliverable, and each is a map-side
partial-aggregated count, never a collect of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate_corpus(
    spark: SparkSession,
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    *,
    quality: bool = True,
    exact: bool = True,
    neardup: bool = False,
    decontam_n: int = 13,
    decontam_min_shared: int = 1,
    sample_rate_per_mille: int | None = None,
    sample_strata_col: str = "lang",
    text_col: str = "text",
) -> tuple[DataFrame, list[dict]]:
    """Run the funnel -> (surviving docs, funnel rows).

    Funnel rows: ``{"stage", "docs_in", "docs_out"}`` in execution
    order, starting with an ``input`` row. ``neardup`` defaults off
    (the LSH + connected-components pass is the expensive stage; turn
    it on when the corpus warrants it). ``eval_df=None`` skips
    decontamination; ``sample_rate_per_mille=None`` skips sampling
    (when set, every stratum keeps that flat per-mille rate via the
    deterministic hash predicate).
    """
    funnel: list[dict] = []
    cur = docs
    n = cur.count()
    funnel.append({"stage": "input", "docs_in": n, "docs_out": n})

    def _step(name: str, nxt: DataFrame) -> DataFrame:
        nonlocal n
        m = nxt.count()
        funnel.append({"stage": name, "docs_in": n, "docs_out": m})
        n = m
        return nxt

    if quality:
        from sparkfts.ops.textstats import quality_scores

        keep = quality_scores(cur, text_col).where("keep").select(
            "doc_id"
        )
        cur = _step("quality", cur.join(keep, "doc_id"))

    if exact:
        winners = (
            cur.select(
                "doc_id", F.md5(F.col(text_col)).alias("__h")
            )
            .groupBy("__h")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        cur = _step("exact_dedup", cur.join(winners, "doc_id"))

    if neardup:
        from sparkfts.ops.dedup import (
            duplicate_clusters,
            lsh_star_edges,
        )

        # star edges: same connected components as all-pairs emission,
        # linear in bucket size (hot boilerplate buckets, r4 VERDICT)
        pairs = lsh_star_edges(cur, text_col=text_col)
        losers = (
            duplicate_clusters(pairs)
            .where(F.col("doc_id") != F.col("cluster_id"))
            .select("doc_id")
        )
        cur = _step(
            "neardup_dedup", cur.join(losers, "doc_id", "left_anti")
        )

    if eval_df is not None:
        from sparkfts.ops.decontam import decontaminate

        cur = _step(
            "decontam",
            decontaminate(
                cur, eval_df, n=decontam_n,
                min_shared=decontam_min_shared, text_col=text_col,
            ),
        )

    if sample_rate_per_mille is not None:
        from sparkfts.ops.sampling import stratified_sample

        cur = _step(
            "sample",
            stratified_sample(
                cur,
                rates_per_mille={},
                strata_col=sample_strata_col,
                default_rate=int(sample_rate_per_mille),
            ),
        )

    return cur, funnel


def funnel_df(spark: SparkSession, funnel: list[dict]) -> DataFrame:
    """The retention table as a DataFrame (stage order preserved via
    an explicit index)."""
    rows = [
        (i, f["stage"], int(f["docs_in"]), int(f["docs_out"]))
        for i, f in enumerate(funnel)
    ]
    return spark.createDataFrame(
        rows, "stage_idx int, stage string, docs_in long, docs_out long"
    )
