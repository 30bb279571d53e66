"""Unigram language-model scoring: corpus-trained cross-entropy /
perplexity per document.

Large-scale pretraining pipelines bucket and filter documents by LM
perplexity (CCNet, Gopher, LLaMA data work all do this with a KenLM
n-gram model).  The container has no KenLM, but the SHAPE — train a
count model on a reference corpus, score every doc, filter/bucket by
the score — is engine work, not model work.  This module implements
the exactly-reproducible unigram case: additive-smoothed corpus
unigram probabilities, per-doc cross-entropy in nats, perplexity
``exp(H)``.  A higher-order external model plugs into the same two
joins (its score table replaces :func:`unigram_counts`).

Pinned math (mirrored 1:1 by the DuckDB oracle):

- analyzer: the engine's pinned ``lower + [a-z0-9]+``.
- counts: ``cnt(t)`` over the TRAINING frame's tokens; vocabulary
  ``V`` = distinct training terms; ``total = sum(cnt)``.
- ``p(t) = (cnt(t) + alpha) / (total + alpha * V)`` — terms unseen in
  training use ``cnt = 0``.
- ``H(doc) = avg over tokens of -ln p(t)``; ``ppl = exp(H)``; empty
  docs are omitted (no tokens to average).

100-TB shape: token explosion stays map-side (JVM ``transform`` /
``explode``, no Python); counts partial-aggregate before the one
shuffle on ``term``; scoring joins the (term, cnt) table — broadcast
when the vocabulary fits, shuffle-join otherwise — then one partial
``groupBy doc_id``.  Nothing collects corpus-sized data to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfts.ops.textstats import tokens_col


def unigram_counts(
    train: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``(term, cnt)`` over the training frame's tokens (pinned
    analyzer), partial-aggregated map-side."""
    return (
        train.select(
            F.explode(tokens_col(F.col(text_col))).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )


def unigram_cross_entropy(
    docs: DataFrame,
    train: DataFrame | None = None,
    counts: DataFrame | None = None,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_counts: bool = False,
) -> DataFrame:
    """Per-doc unigram cross-entropy -> ``(doc_id, n_tokens, h, ppl)``.

    ``counts`` (a (term, cnt) frame) overrides ``train``; by default
    the model is trained on ``docs`` itself (self-perplexity — the
    repetition/templatedness signal).  Set ``broadcast_counts`` when
    the vocabulary is known to fit on executors.
    """
    if counts is None:
        counts = unigram_counts(
            docs if train is None else train, text_col
        )
    totals = counts.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("vocab")
    )
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    )
    cnt_side = F.broadcast(counts) if broadcast_counts else counts
    # -ln p per token; unseen-in-training terms fall back to cnt=0
    logp = F.log(
        (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(float(alpha)))
        / (F.col("total") + F.lit(float(alpha)) * F.col("vocab"))
    )
    return (
        toks.join(cnt_side, "term", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (-F.avg(logp)).alias("h"),
        )
        .withColumn("ppl", F.exp(F.col("h")))
    )


def perplexity_buckets(
    scored: DataFrame, boundaries: list[float]
) -> DataFrame:
    """CCNet-style head/middle/tail bucketing: assign each doc the
    index of the first boundary its perplexity is under (len(boundaries)
    = the tail bucket). ``boundaries`` ascending."""
    bucket = F.lit(len(boundaries))
    for i in range(len(boundaries) - 1, -1, -1):
        bucket = F.when(
            F.col("ppl") < float(boundaries[i]), F.lit(i)
        ).otherwise(bucket)
    return scored.withColumn("bucket", bucket)
