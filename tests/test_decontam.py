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
