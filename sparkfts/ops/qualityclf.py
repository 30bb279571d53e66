"""Model-based quality classification (the FineWeb-Edu / CCNet stage).

Production web-corpus pipelines follow heuristic cleaning with a LEARNED
quality filter: a linear classifier over hashed bag-of-words features
(fastText's architecture: mean-pooled hashed token features -> linear ->
sigmoid) scores every document, and a threshold keeps the high-quality
tail. This module provides that stage Spark-first:

- :func:`clf_scores` — score a corpus under a given weight vector.
  Plan: explode tokens -> cross-engine-stable hash bucket
  (:func:`sparkfts.ops.textstats.term_hash31` mod ``dim``) ->
  **broadcast** join against the (bucket, weight) table -> ONE
  map-side-partial ``groupBy(doc_id)`` -> rowwise sigmoid. No Python
  UDF anywhere; the weight table is ``dim`` rows (broadcast is free);
  the single shuffle is the hash-partial doc aggregation — linear in
  corpus size, the same class as every counting op here.
- :func:`train_logreg` — distributed logistic-regression training:
  full-batch gradient descent where each iteration is one Spark pass
  (per-doc sigmoid residuals -> per-bucket gradient partial-agg), and
  only the ``dim``-sized gradient vector ever reaches the driver
  (bounded coordinator reduce, the BPE/unigram trainer shape). The
  feature frame is computed ONCE and cached across iterations.
- :func:`pinned_weights` — a deterministic, SQL-expressible weight
  formula (``w[b] = ((b * 2654435761) % 2000003) / 1e6 - 1``) so the
  scoring path is oracle-checkable end-to-end without shipping a model
  artifact; real deployments pass trained weights instead.

Scoring pin: ``z = intercept + mean over tokens of w[bucket(token)]``
(fastText mean pooling; an empty-token doc scores the bare intercept),
``prob = 1 / (1 + exp(-z))``, keep iff ``z >= 0`` (prob >= 0.5) unless
a threshold is given.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfts.ops.textstats import term_hash31, tokens_col

# the pinned-weights formula constants (documented above; both factors
# fit int64 for any bucket < 2^31)
_PW_MUL = 2654435761
_PW_MOD = 2_000_003


def pinned_weights(dim: int) -> list[float]:
    """Deterministic pseudo-random weights in [-1, 1) (module pin)."""
    return [((b * _PW_MUL) % _PW_MOD) / 1_000_000.0 - 1.0
            for b in range(dim)]


def _bucket_col(term, dim: int):
    return (term_hash31(term) % F.lit(int(dim))).alias("bucket")


def _features(docs: DataFrame, dim: int, text_col: str) -> DataFrame:
    """(doc_id, bucket, n_toks) — one row per token occurrence."""
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    n = toks.groupBy("doc_id").agg(F.count("*").alias("n_toks"))
    return (
        toks.select("doc_id", _bucket_col(F.col("tok"), dim))
        .join(n, "doc_id")
    )


def clf_scores(
    docs: DataFrame,
    weights: list[float],
    intercept: float = 0.0,
    text_col: str = "text",
    threshold: float | None = None,
) -> DataFrame:
    """Score every doc -> (doc_id, z, prob, kept). ``weights`` length
    is the feature dimension; ``kept`` is ``z >= 0`` (prob >= 0.5) or
    ``prob >= threshold`` when given."""
    dim = len(weights)
    if dim < 1:
        raise ValueError("weights must be non-empty")
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(b, float(w)) for b, w in enumerate(weights)],
        "bucket long, w double",
    )
    feats = _features(docs, dim, text_col)
    summed = (
        feats.join(F.broadcast(wdf), "bucket")
        .groupBy("doc_id")
        .agg((F.sum("w") / F.first("n_toks")).alias("pooled"))
    )
    z = F.lit(float(intercept)) + F.coalesce(F.col("pooled"), F.lit(0.0))
    out = (
        docs.select("doc_id")
        .join(summed, "doc_id", "left")
        .select(
            "doc_id",
            z.alias("z"),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("prob"),
        )
    )
    keep = (
        (F.col("prob") >= F.lit(float(threshold)))
        if threshold is not None
        else (F.col("z") >= F.lit(0.0))
    )
    return out.withColumn("kept", keep)


def train_logreg(
    examples: DataFrame,
    dim: int = 1024,
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 0.0,
    text_col: str = "text",
    label_col: str = "label",
) -> tuple[list[float], float]:
    """Full-batch distributed logistic regression over hashed features
    -> (weights, intercept).

    Per iteration ONE Spark pass: current weights broadcast ->
    per-doc ``z`` (the :func:`clf_scores` plan over the CACHED feature
    frame) -> residual ``p - y`` -> per-bucket gradient
    ``sum(resid / n_toks)`` partial-agg -> a ``dim``-row collect.
    Everything corpus-sized stays distributed; the driver only ever
    holds the weight/gradient vectors (bounded coordinator reduce —
    the same contract as the BPE/unigram trainers)."""
    if dim < 1 or iters < 1:
        raise ValueError("dim and iters must be >= 1")
    spark = examples.sparkSession
    labeled = examples.select(
        "doc_id", F.col(label_col).cast("double").alias("y"), text_col
    )
    feats = _features(labeled, dim, text_col).cache()
    labels = labeled.select("doc_id", "y")
    n_examples = labels.count()
    if n_examples == 0:
        raise ValueError("no training examples")

    w = [0.0] * dim
    b = 0.0
    for _ in range(int(iters)):
        wdf = spark.createDataFrame(
            [(i, float(wi)) for i, wi in enumerate(w)],
            "bucket long, w double",
        )
        pooled = (
            feats.join(F.broadcast(wdf), "bucket")
            .groupBy("doc_id")
            .agg((F.sum("w") / F.first("n_toks")).alias("pooled"))
        )
        resid = (
            labels.join(pooled, "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(
                            -(
                                F.lit(b)
                                + F.coalesce(
                                    F.col("pooled"), F.lit(0.0)
                                )
                            )
                        )
                    )
                    - F.col("y")
                ).alias("r"),
            )
        )
        grad_rows = (
            feats.join(resid, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("r") / F.col("n_toks")).alias("g"))
            .collect()
        )
        b_grad = resid.agg(F.sum("r")).collect()[0][0] or 0.0
        grad = [0.0] * dim
        for r in grad_rows:
            grad[int(r["bucket"])] = float(r["g"])
        scale = lr / n_examples
        w = [
            wi - scale * (gi + l2 * wi) for wi, gi in zip(w, grad)
        ]
        b = b - scale * float(b_grad)
    feats.unpersist()
    return w, b


def logloss(
    examples: DataFrame,
    weights: list[float],
    intercept: float,
    text_col: str = "text",
    label_col: str = "label",
) -> float:
    """Mean logistic loss of (weights, intercept) on labeled docs."""
    scored = clf_scores(examples, weights, intercept, text_col)
    joined = scored.join(
        examples.select(
            "doc_id", F.col(label_col).cast("double").alias("y")
        ),
        "doc_id",
    )
    eps = 1e-12
    loss = joined.agg(
        F.avg(
            -(
                F.col("y")
                * F.log(F.greatest(F.col("prob"), F.lit(eps)))
                + (F.lit(1.0) - F.col("y"))
                * F.log(
                    F.greatest(F.lit(1.0) - F.col("prob"), F.lit(eps))
                )
            )
        )
    ).collect()[0][0]
    return float(loss)
