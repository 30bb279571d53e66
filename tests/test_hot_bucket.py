"""Hot-bucket guards for LSH pair generation (round-4 VERDICT fix #1).

A web corpus's boilerplate cluster (10^4-10^6 near-identical pages) lands
in ONE LSH bucket regardless of the hash family, so all-intra-bucket-pairs
emission is O(B^2) — the job that never finishes at 100 TB.  These tests
plant such a cluster and pin:

- lsh_star_edges: LINEAR edge count in cluster size, with connected
  components (and therefore duplicate_clusters output) IDENTICAL to
  all-pairs emission;
- dedup_against: bit-identical after the ref-side per-bucket min
  pre-aggregation;
- embedding_dup_pairs(bucket_cap=...) / knn_join(bucket_cap=...): bounded
  fan-out, output a subset of uncapped;
- semdedup: lossless exact-duplicate pre-collapse — identical quantized
  vectors never enter pair generation, output clusters unchanged.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkfts.ops.dedup import (
    dedup_against,
    duplicate_clusters,
    lsh_candidate_pairs,
    lsh_star_edges,
)
from sparkfts.ops.knnjoin import knn_join, semdedup
from sparkfts.ops.similarity import embedding_dup_pairs


def _boiler_docs(spark, n, extra=()):
    """n near-identical boilerplate docs (+ optional distinct extras)."""
    boiler = (
        "terms of service privacy policy cookie notice all rights "
        "reserved contact us about careers press sitemap help center"
    )
    rows = [(i, boiler) for i in range(n)]
    rows += [(10_000 + j, t) for j, t in enumerate(extra)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_star_edges_linear_in_cluster_size(spark):
    # the planted 10^4 boilerplate cluster from the r4 VERDICT
    docs = _boiler_docs(spark, 10_000)
    n_edges = lsh_star_edges(docs).count()
    # identical docs share every band bucket; star = B-1 edges per band,
    # distinct across bands collapses to B-1 total. Allow the 4-band
    # worst case; the quadratic count would be ~5*10^7.
    assert n_edges <= 4 * (10_000 - 1)
    assert n_edges >= 10_000 - 1


def test_star_edges_components_equal_all_pairs(spark):
    # mixed corpus small enough for the quadratic baseline
    extras = [
        f"unique document number {i} about spark partitions and joins"
        for i in range(30)
    ]
    # two planted clusters with different texts
    rows = [(i, "first boilerplate cluster text shared verbatim") for i in range(40)]
    rows += [(100 + i, "second shared cluster entirely different words here")
             for i in range(25)]
    rows += [(1000 + j, t) for j, t in enumerate(extras)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    all_pairs = lsh_candidate_pairs(docs)
    star = lsh_star_edges(docs)
    want = {
        (r["doc_id"], r["cluster_id"], r["is_canonical"])
        for r in duplicate_clusters(all_pairs).collect()
    }
    got = {
        (r["doc_id"], r["cluster_id"], r["is_canonical"])
        for r in duplicate_clusters(star).collect()
    }
    assert got == want
    assert star.count() < all_pairs.count()


def test_candidate_pairs_bucket_cap_bounds_and_subsets(spark):
    docs = _boiler_docs(
        spark, 60,
        extra=[f"unique text {i} with several different tokens" for i in range(10)],
    )
    uncapped = {
        (r["a_id"], r["b_id"]) for r in lsh_candidate_pairs(docs).collect()
    }
    capped = {
        (r["a_id"], r["b_id"])
        for r in lsh_candidate_pairs(docs, bucket_cap=8).collect()
    }
    assert capped <= uncapped
    # 60-doc bucket: uncapped C(60,2)=1770 pairs; capped <= C(8,2) per band
    assert len(uncapped) >= 1770
    assert len(capped) <= 4 * 28


def test_dedup_against_matches_brute(spark):
    ref = _boiler_docs(spark, 50)
    new_rows = [(5_000 + i, "terms of service privacy policy cookie notice "
                 "all rights reserved contact us about careers press "
                 "sitemap help center") for i in range(5)]
    new_rows += [(6_000, "totally novel content that matches nothing else")]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    got = {(r["doc_id"], r["ref_doc_id"])
           for r in dedup_against(new, ref).collect()}
    # every boilerplate new doc collides with the ref cluster whose min id
    # is 0; the novel doc never appears
    assert got == {(5_000 + i, 0) for i in range(5)}


@pytest.fixture(scope="module")
def flood_emb(spark):
    """500 identical vectors (id 0..499) + 20 distinct + 3 perturbed dups."""
    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.normal(size=(24, 8)).astype("float32")
    flood = [float(x) for x in base[0]]
    rows = [(i, flood) for i in range(500)]
    rows += [(1_000 + j, [float(x) for x in base[j]]) for j in range(1, 21)]
    for j in range(1, 4):
        pert = base[j] + rng.normal(scale=0.005, size=8).astype("float32")
        rows.append((2_000 + j, [float(x) for x in pert]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semdedup_collapse_is_lossless(spark, flood_emb):
    """semdedup (rep-collapsed) == the raw-pairs formulation, bit for bit."""
    got = {
        (r["vec_id"], r["cluster_id"], r["is_canonical"])
        for r in semdedup(flood_emb, threshold_e6=950_000, n_planes=4).collect()
    }
    # raw reference: the pre-r5 formulation (all rows enter pair gen)
    pairs = embedding_dup_pairs(
        flood_emb, threshold_e6=950_000, bucketed=True, n_planes=4
    ).select("id_a", "id_b")
    clustered = duplicate_clusters(pairs, a_col="id_a", b_col="id_b")
    ids = flood_emb.select(F.col("vec_id"))
    raw = ids.join(
        clustered.withColumnRenamed("doc_id", "vec_id"), "vec_id", "left"
    ).select(
        "vec_id",
        F.coalesce(F.col("cluster_id"), F.col("vec_id")).alias("cluster_id"),
        F.coalesce(F.col("is_canonical"), F.lit(True)).alias("is_canonical"),
    )
    want = {
        (r["vec_id"], r["cluster_id"], r["is_canonical"])
        for r in raw.collect()
    }
    assert got == want
    # the flood collapses into one cluster, canonical = min id = 0
    flood_rows = {t for t in got if t[0] < 500}
    assert flood_rows == {(i, 0, i == 0) for i in range(500)}


def test_semdedup_flood_generates_no_quadratic_pairs(spark, flood_emb):
    """The 500-identical flood enters pair generation as ONE rep: the
    perturbed dups still cluster, and the rep-side pair count is bounded
    by distinct-vector combinations (24 distinct -> <= C(24,2)), never
    C(500,2) = 124750."""
    reps = flood_emb.select(
        F.md5(F.array_join(
            F.transform(
                F.transform(F.col("embedding"),
                            lambda x: F.floor(x.cast("double") * 1000 + 0.5)
                            .cast("long")),
                lambda x: x.cast("string")),
            ",")).alias("k")
    ).distinct().count()
    assert reps == 24
    out = semdedup(flood_emb, threshold_e6=950_000, n_planes=4)
    assert out.count() == 523


def test_embedding_pairs_bucket_cap(spark, flood_emb):
    uncapped = embedding_dup_pairs(
        flood_emb, threshold_e6=950_000, bucketed=True, n_planes=2
    )
    capped = embedding_dup_pairs(
        flood_emb, threshold_e6=950_000, bucketed=True, n_planes=2,
        bucket_cap=10,
    )
    got_c = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    got_u = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    assert got_c <= got_u
    # 4 buckets at n_planes=2: capped pair count <= 4 * C(10,2)
    assert len(got_c) <= 4 * 45
    assert len(got_u) >= 500 * 499 // 2  # the flood is quadratic uncapped


def test_knn_join_bucket_cap(spark, flood_emb):
    capped = knn_join(
        flood_emb, flood_emb, k=2, method="lsh", n_planes=2, bucket_cap=10
    )
    rows = capped.collect()
    assert len(rows) > 0
    # candidates only come from the first 10 b_ids per bucket
    assert all(r["b_id"] <= 2_003 for r in rows)
    uncapped_top = {
        (r["a_id"], r["rank"], r["b_id"])
        for r in knn_join(
            flood_emb.where(F.col("vec_id") >= 1_000),
            flood_emb.where(F.col("vec_id") >= 1_000),
            k=2, method="lsh", n_planes=2,
        ).collect()
    }
    capped_same = {
        (r["a_id"], r["rank"], r["b_id"])
        for r in knn_join(
            flood_emb.where(F.col("vec_id") >= 1_000),
            flood_emb.where(F.col("vec_id") >= 1_000),
            k=2, method="lsh", n_planes=2, bucket_cap=1_000,
        ).collect()
    }
    assert capped_same == uncapped_top  # cap above bucket size: no-op
