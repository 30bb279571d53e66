"""Embedding-cosine near-dup: exact baseline vs LSH-bucketed scale path."""

from __future__ import annotations

import numpy as np
import pytest

from sparkfts.ops.similarity import embedding_dup_pairs


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.Generator(np.random.PCG64(11))
    base = rng.normal(size=(40, 16)).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # seed guaranteed near-dups: tiny perturbations of the first 5 vectors
    for j in range(5):
        pert = base[j] + rng.normal(scale=0.01, size=16).astype("float32")
        rows.append((100 + j, [float(x) for x in pert]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_exact_pairs_find_planted_dups(emb_df):
    got = embedding_dup_pairs(emb_df, threshold_e6=990_000).collect()
    found = {(r["id_a"], r["id_b"]) for r in got}
    for j in range(5):
        assert (j, 100 + j) in found, f"planted near-dup {j} missed"
    for r in got:
        assert r["cos_e6"] >= 990_000


def test_bucketed_is_subset_of_exact(emb_df):
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs(emb_df, threshold_e6=990_000).collect()
    }
    bucketed = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs(
            emb_df, threshold_e6=990_000, bucketed=True, n_planes=4
        ).collect()
    }
    assert bucketed <= exact
    # near-identical vectors agree on all hyperplane signs -> high recall
    assert len(bucketed) >= len(exact) // 2
