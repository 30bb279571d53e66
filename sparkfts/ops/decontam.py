"""Test-set decontamination: n-gram overlap between a training corpus and
an evaluation set (the standard 13-gram contamination check used by
large-scale training-data pipelines).

Shape at 100 TB: the eval side (benchmark suites) is tiny relative to the
corpus — its distinct gram set broadcasts, so the overlap join is a
broadcast hash join with NO shuffle of the training side; the per-pair
counts then partial-aggregate map-side. Nothing in the plan is
proportional to corpus size except the one streaming pass. Grams are
31-bit md5-derived hashes (``term_hash31``) so the shuffle/broadcast
carries 8-byte ints, not strings, and DuckDB reproduces them exactly for
the driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfts.ops.textstats import term_hash31, tokens_col


def token_ngrams(
    docs: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_id: str = "doc_id",
) -> DataFrame:
    """Distinct word n-grams -> (out_id, gram31). One row per distinct
    gram per doc (set semantics — contamination counts distinct grams)."""
    toks = tokens_col(F.col(text_col))
    # Docs shorter than n tokens contribute no grams. The short-doc case
    # must be guarded explicitly: sequence(1, 0) is DESCENDING [1, 0] in
    # Spark, so the transform would evaluate slice(toks, 0, n) and throw
    # INVALID_PARAMETER_VALUE.START on any doc with < n tokens.
    grams = F.expr(
        f"CASE WHEN size(toks) >= {n} THEN "
        f"transform(sequence(1, size(toks) - {n - 1}), "
        f"i -> array_join(slice(toks, i, {n}), ' ')) "
        f"ELSE array() END"
    )
    return (
        docs.select(F.col(id_col).alias(out_id), toks.alias("toks"))
        .select(out_id, F.explode(F.array_distinct(grams)).alias("gram"))
        .select(out_id, term_hash31(F.col("gram")).alias("gram31"))
    )


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    eval_text_col: str = "text",
    eval_id_col: str = "doc_id",
) -> DataFrame:
    """Contamination pairs -> (doc_id, eval_id, n_shared): training docs
    sharing at least one n-gram with an eval doc, with the count of
    distinct shared grams.

    The eval gram table is broadcast (benchmarks are small); the train
    side streams through one narrow pass + a grouped count.
    """
    tg = token_ngrams(train, n, text_col)
    eg = token_ngrams(
        eval_df, n, eval_text_col, id_col=eval_id_col, out_id="eval_id"
    )
    return (
        tg.join(F.broadcast(eg), "gram31")
        .groupBy("doc_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
        .orderBy("doc_id", "eval_id")
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    min_shared: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Drop training docs contaminated by the eval set (>= ``min_shared``
    distinct shared n-grams with ANY eval doc). Left-anti join against
    the flagged id set — the consuming shape of :func:`ngram_overlap`."""
    flagged = (
        ngram_overlap(train, eval_df, n, text_col)
        .groupBy("doc_id")
        .agg(F.sum("n_shared").alias("total_shared"))
        .where(F.col("total_shared") >= min_shared)
        .select("doc_id")
    )
    return train.join(flagged, "doc_id", "left_anti")
