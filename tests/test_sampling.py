"""Corpus-shaping ops (sparkfts.ops.sampling): per-group caps and
deterministic stratified sampling."""

from __future__ import annotations

import pandas as pd
import pytest

from sparkfts.ops.sampling import (
    HASH_A,
    HASH_B,
    HASH_P,
    cap_per_group,
    stratified_sample,
)


@pytest.fixture(scope="module")
def sdocs(spark):
    rows = [
        (i, f"src{i % 7}", ["en", "de", "fr"][i % 3]) for i in range(400)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, lang string"
    )


def test_cap_per_group(spark, sdocs):
    out = cap_per_group(sdocs, "source", 5).toPandas()
    sizes = out.groupby("source").size()
    assert (sizes <= 5).all() and len(sizes) == 7
    # deterministic: lowest doc_ids win per group
    for src, grp in out.groupby("source"):
        lo = sorted(
            r.doc_id for r in sdocs.where(f"source = '{src}'").collect()
        )[:5]
        assert sorted(grp["doc_id"]) == lo
    # cap larger than any group = identity
    assert cap_per_group(sdocs, "source", 10_000).count() == sdocs.count()
    with pytest.raises(ValueError):
        cap_per_group(sdocs, "source", 0)


def _py_keep_hash(doc_id: int) -> int:
    h = (doc_id % HASH_P + HASH_P) % HASH_P
    return (h * HASH_A + HASH_B) % HASH_P % 1000


def test_stratified_sample_deterministic(spark, sdocs):
    rates = {"en": 500, "de": 100}
    out = stratified_sample(sdocs, rates, strata_col="lang").toPandas()
    src = sdocs.toPandas()
    expected = src[
        src.apply(
            lambda r: _py_keep_hash(int(r.doc_id))
            < rates.get(r.lang, 0),
            axis=1,
        )
    ]
    assert sorted(out["doc_id"]) == sorted(expected["doc_id"])
    # fr has no rate and default 0 -> fully dropped
    assert not (out["lang"] == "fr").any()
    # rerun -> identical keep set (pure function, no RNG)
    again = stratified_sample(sdocs, rates, strata_col="lang").toPandas()
    assert sorted(again["doc_id"]) == sorted(out["doc_id"])


def test_stratified_sample_rates_roughly_hold(spark, sdocs):
    out = stratified_sample(
        sdocs, {"en": 500, "de": 100, "fr": 1000}, strata_col="lang"
    ).toPandas()
    by_lang = out.groupby("lang").size()
    n_per_lang = sdocs.toPandas().groupby("lang").size()
    assert by_lang.get("fr", 0) == n_per_lang["fr"]  # rate 1000 = keep all
    assert 0 < by_lang.get("de", 0) < by_lang.get("en", 0)
    with pytest.raises(ValueError):
        stratified_sample(sdocs, {"en": 1001})


def test_stratified_sample_no_shuffle(spark, sdocs):
    """The sample is a rowwise predicate: the plan has no Exchange."""
    plan = stratified_sample(
        sdocs, {"en": 500}, strata_col="lang"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
