"""Domain-mixture planning + deterministic application."""

from __future__ import annotations

import pandas as pd
import pytest

from sparkfts.ops.mixing import apply_mixture, mixture_plan
from sparkfts.ops.sampling import HASH_A, HASH_B, HASH_P


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    # group a: 60 docs x 100 tok; b: 30 x 200; c: 10 x 50; d unlisted
    for i in range(60):
        rows.append((i, "a", 100))
    for i in range(30):
        rows.append((100 + i, "b", 200))
    for i in range(10):
        rows.append((200 + i, "c", 50))
    rows.append((300, "d", 999))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "n_tokens"])
    )


def test_mixture_plan(spark, docs):
    plan = mixture_plan(
        docs, {"a": 0.5, "b": 0.3, "c": 0.2}, token_budget=6000
    ).collect()
    by = {r["group"]: r for r in plan}
    assert set(by) == {"a", "b", "c", "d"}
    # a: avail 6000, target 3000 -> 500 permille
    assert by["a"]["tokens_available"] == 6000
    assert by["a"]["target_tokens"] == 3000
    assert by["a"]["keep_permille"] == 500
    assert not by["a"]["undersupplied"]
    # b: avail 6000, target 1800 -> 300 permille
    assert by["b"]["keep_permille"] == 300
    # c: avail 500 < target 1200 -> keep all, flagged
    assert by["c"]["keep_permille"] == 1000
    assert by["c"]["undersupplied"]
    # d: no weight -> dropped entirely
    assert by["d"]["keep_permille"] == 0
    with pytest.raises(ValueError):
        mixture_plan(docs, {}, 100)
    with pytest.raises(ValueError):
        mixture_plan(docs, {"a": 1.0}, 0)


def _keep(doc_id, permille):
    h = doc_id % HASH_P
    return (h * HASH_A + HASH_B) % HASH_P % 1000 < permille


def test_apply_mixture_deterministic(spark, docs):
    plan = mixture_plan(
        docs, {"a": 0.5, "b": 0.3, "c": 0.2}, token_budget=6000
    )
    out = apply_mixture(docs, plan).collect()
    rates = {r["group"]: r["keep_permille"] for r in plan.collect()}
    exp = {
        r["doc_id"]
        for r in docs.collect()
        if _keep(r["doc_id"], rates[r["source"]])
    }
    assert {r["doc_id"] for r in out} == exp
    # repartition invariance
    out2 = apply_mixture(docs.repartition(7), plan).collect()
    assert {r["doc_id"] for r in out2} == exp
    # every kept 'c' doc (rate 1000) survives; no 'd' docs survive
    srcs = {r["source"] for r in out}
    assert "c" in srcs and "d" not in srcs
    c_kept = [r for r in out if r["source"] == "c"]
    assert len(c_kept) == 10


def test_mixture_tracks_target(spark, docs):
    plan = mixture_plan(docs, {"a": 0.5, "b": 0.5}, token_budget=8000)
    out = apply_mixture(docs, plan).toPandas()
    got = out.groupby("source")["n_tokens"].sum()
    exp = {
        r["group"]: r["expected_tokens"] for r in plan.collect()
    }
    for g in ("a", "b"):
        # sampling noise at n~tens of docs: within 40% of expectation
        assert abs(got.get(g, 0) - exp[g]) <= max(0.4 * exp[g], 400), g
