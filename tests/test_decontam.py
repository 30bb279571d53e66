"""Test-set decontamination (n-gram overlap) — training-pipeline op."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkfts.ops.decontam import decontaminate, ngram_overlap, token_ngrams


@pytest.fixture(scope="module")
def contaminated(spark, corpus):
    """Train = corpus docs + 3 planted copies of eval docs; eval = 5 docs."""
    import pandas as pd

    pdf = corpus.to_pandas()[["text"]].head(100).copy()
    pdf["doc_id"] = range(100)
    train = spark.createDataFrame(pdf[["doc_id", "text"]])
    eval_pdf = pdf.head(5).copy()
    eval_pdf["doc_id"] = [900, 901, 902, 903, 904]
    eval_df = spark.createDataFrame(eval_pdf[["doc_id", "text"]])
    # plant verbatim leaks of eval docs 900-902 under fresh train ids
    leak = eval_pdf.head(3).copy()
    leak["doc_id"] = [500, 501, 502]
    train = train.unionByName(spark.createDataFrame(leak[["doc_id", "text"]]))
    return train, eval_df


def test_overlap_finds_planted_leaks(contaminated):
    train, eval_df = contaminated
    got = ngram_overlap(train, eval_df, n=13).collect()
    pairs = {(r["doc_id"], r["eval_id"]) for r in got}
    # each eval doc matches its own source (0-4) …
    for i in range(5):
        assert (i, 900 + i) in pairs
    # … and the planted verbatim copies match too
    for i in range(3):
        assert (500 + i, 900 + i) in pairs
    # shared-gram count of a verbatim copy equals the doc's own gram count
    by_pair = {(r["doc_id"], r["eval_id"]): r["n_shared"] for r in got}
    own = token_ngrams(train.where(F.col("doc_id") == 500), 13).count()
    assert by_pair[(500, 900)] == own > 0


def test_decontaminate_drops_only_contaminated(contaminated):
    train, eval_df = contaminated
    kept = decontaminate(train, eval_df, n=13)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # sources 0-4 and leaks 500-502 are gone; everything else survives
    assert kept_ids.isdisjoint({0, 1, 2, 3, 4, 500, 501, 502})
    assert len(kept_ids) == train.count() - 8


def test_overlap_eval_side_broadcast(contaminated):
    """The eval gram table must broadcast (no shuffle of the train side)."""
    train, eval_df = contaminated
    plan = (
        ngram_overlap(train, eval_df, n=13)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_short_docs_emit_no_grams(spark):
    """Docs with < n tokens must yield zero grams, not crash.

    Regression: sequence(1, 0) is DESCENDING in Spark, so the unguarded
    transform evaluated slice(toks, 0, 13) and threw
    INVALID_PARAMETER_VALUE.START on any doc shorter than n tokens.
    """
    docs = spark.createDataFrame(
        [(1, "too short"), (2, ""), (3, "exactly three tokens"),
         (4, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    got = token_ngrams(docs, n=3).collect()
    ids = {r["doc_id"] for r in got}
    assert 1 not in ids and 2 not in ids  # < 3 tokens -> no grams
    assert sum(1 for r in got if r["doc_id"] == 3) == 1  # exactly n -> 1 gram
    assert sum(1 for r in got if r["doc_id"] == 4) == 8  # 10 - 3 + 1


def test_decontaminate_survives_short_docs(spark):
    """End-to-end: ngram_overlap/decontaminate on a corpus with short docs."""
    train = spark.createDataFrame(
        [(1, "hi"), (2, "a b c d e f g h i j k l m n o p")],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(9, "a b c d e f g h i j k l m n o p")], "doc_id long, text string"
    )
    kept = decontaminate(train, eval_df, n=13)
    assert {r["doc_id"] for r in kept.collect()} == {1}
