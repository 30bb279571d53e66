"""Round-2 dedup-plane additions: Jaccard hot-shingle cap, duplicate
cluster resolution, SimHash explode removal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkfts.ops.dedup import (
    duplicate_clusters,
    ngram_jaccard_pairs,
    shingles,
    simhash32,
)


@pytest.fixture(scope="module")
def hot_shingle_docs(spark):
    """Every doc shares one ubiquitous lead-in phrase (a stop-shingle with
    df = n_docs); pairs (2i, 2i+1) additionally share real content."""
    rows = []
    for i in range(30):
        body = (
            f"unique{i} content{i} piece{i} number{i} "
            f"alpha{i} beta{i} gamma{i} delta{i}"
        )
        rows.append((2 * i, f"of the and {body} one"))
        rows.append((2 * i + 1, f"of the and {body} two"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_cap_same_pairs_bounded_join(hot_shingle_docs):
    uncapped = ngram_jaccard_pairs(hot_shingle_docs, threshold=0.5).collect()
    capped = ngram_jaccard_pairs(
        hot_shingle_docs, threshold=0.5, shingle_df_cap=5
    ).collect()
    assert sorted((r["a_id"], r["b_id"], r["jaccard_e6"]) for r in uncapped) == \
        sorted((r["a_id"], r["b_id"], r["jaccard_e6"]) for r in capped)
    # the planted twins must survive with their EXACT jaccard (hot
    # shingles counted back into the intersection)
    found = {(r["a_id"], r["b_id"]) for r in capped}
    assert all((2 * i, 2 * i + 1) in found for i in range(30))

    # bound actually bites: the ubiquitous shingles exceed the cap, so
    # candidate generation excludes them — its join input is the rare
    # rows only (60 docs x a few rare shingles, not df^2 = 3600+ rows
    # per hot shingle)
    s = shingles(hot_shingle_docs)
    sdf = s.groupBy("shingle").agg(F.count("*").alias("d"))
    hot_rows = (
        s.join(sdf.where(F.col("d") > 5), "shingle").count()
    )
    rare_rows = s.count() - hot_rows
    assert hot_rows > 0, "fixture failed to create a hot shingle"
    # every hot-bucket pair the uncapped join would enumerate:
    hot_pairs = (
        sdf.where(F.col("d") > 5)
        .select((F.col("d") * (F.col("d") - 1) / 2).alias("p"))
        .agg(F.sum("p"))
        .collect()[0][0]
    )
    assert hot_pairs > rare_rows, (
        "cap is load-bearing: the avoided hot-bucket pair count dwarfs "
        "the rare join input"
    )


def test_jaccard_cap_drops_hot_only_pairs(spark):
    """Docs sharing ONLY the ubiquitous shingle are not emitted under the
    cap (the documented recall trade) but are also below any sane
    threshold in the uncapped result."""
    rows = [(i, f"of the and item{i} x{i} y{i} z{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = ngram_jaccard_pairs(docs, threshold=0.05, shingle_df_cap=5).collect()
    assert capped == []


def test_duplicate_clusters_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 20)],
        "a_id long, b_id long",
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in duplicate_clusters(pairs).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False), 4: (1, False),
        10: (10, True), 11: (10, False),
        20: (20, True), 21: (20, False), 22: (20, False),
    }


def test_duplicate_clusters_long_chain(spark):
    """A 12-node path graph converges to one cluster (diameter rounds)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)], "a_id long, b_id long"
    )
    rows = duplicate_clusters(pairs).collect()
    assert {r["cluster_id"] for r in rows} == {100}
    assert sum(r["is_canonical"] for r in rows) == 1


def test_simhash_no_bit_explode(spark, corpus):
    """The plan must contain exactly ONE Generate (the token explode) —
    the 32x per-bit explode is gone (round-1 VERDICT perf fix #7)."""
    docs = spark.createDataFrame(corpus.to_pandas()).limit(50)
    docs = docs.withColumn(
        "doc_id", F.monotonically_increasing_id()
    ).select("doc_id", "text")
    sh = simhash32(docs)
    plan = sh._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") == 1, plan
    # and it still produces one row per doc with a 32-bit value
    rows = sh.collect()
    assert len(rows) == 50
    assert all(0 <= r["simhash"] < 2**32 for r in rows)


def test_duplicate_clusters_path_doubling_long_chain(spark):
    """A 200-node path must converge within max_iters=10 — only possible
    with pointer jumping (pure neighbor propagation needs ~200 rounds)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1000, 1200)], "a_id long, b_id long"
    )
    rows = duplicate_clusters(pairs, max_iters=10).collect()
    assert len(rows) == 201
    assert {r["cluster_id"] for r in rows} == {1000}
    assert sum(r["is_canonical"] for r in rows) == 1


def test_duplicate_clusters_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir mode (durable checkpoint()) produces identical
    clusters to the default localCheckpoint mode — the cluster
    fault-tolerance hardening from the r2 VERDICT nit."""
    from sparkfts.ops.dedup import duplicate_clusters

    # 30-node chain + a triangle + an isolated pair
    edges = [(i, i + 1) for i in range(30)] + [
        (100, 101), (101, 102), (100, 102), (200, 201),
    ]
    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    base = {
        (r["doc_id"], r["cluster_id"], r["is_canonical"])
        for r in duplicate_clusters(pairs).collect()
    }
    ck = str(tmp_path / "ckpt")
    durable = {
        (r["doc_id"], r["cluster_id"], r["is_canonical"])
        for r in duplicate_clusters(pairs, checkpoint_dir=ck).collect()
    }
    assert base == durable
    assert {c for _, c, _ in base} == {0, 100, 200}
    import os

    # the durable run actually wrote checkpoint data
    assert any(os.scandir(ck))


# ---- incremental dedup against a reference corpus ----


def _split_docs(spark):
    import pandas as pd

    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "completely unrelated text about spark query engines and joins",
        "a third document with its own distinctive shingle stream here",
    ]
    rows = []
    # ref corpus: ids 0-2; new corpus: 10 = exact copy of 0,
    # 11 = near-dup of 1 (one word changed), 12 = fresh content
    for i, t in enumerate(base):
        rows.append((i, t))
    rows.append((10, base[0]))
    rows.append((11, base[1].replace("joins", "aggregations")))
    rows.append((12, "entirely novel content never seen in the reference"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf)
    return df.where("doc_id < 10"), df.where("doc_id >= 10")


def test_exact_dedup_against(spark):
    from sparkfts.ops.dedup import exact_dedup_against

    ref, new = _split_docs(spark)
    kept = sorted(
        r["doc_id"] for r in exact_dedup_against(new, ref).collect()
    )
    assert kept == [11, 12]  # 10 is an exact copy of ref doc 0


def test_dedup_against_minhash(spark):
    from sparkfts.ops.dedup import dedup_against, lsh_candidate_pairs

    ref, new = _split_docs(spark)
    rows = dedup_against(new, ref).collect()
    got = {r["doc_id"]: r["ref_doc_id"] for r in rows}
    assert got[10] == 0            # exact copy always collides
    assert 11 in got and got[11] == 1  # near-dup shares >= 1 band
    assert 12 not in got           # fresh content matches nothing
    # cross-corpus candidates == within-union candidates restricted to
    # (new, ref) pairs — same hash family by construction
    union = ref.unionByName(new)
    pairs = {
        (r["a_id"], r["b_id"])
        for r in lsh_candidate_pairs(union).collect()
    }
    for new_id, ref_id in got.items():
        assert any(
            (a, b) in pairs
            for a, b in [(ref_id, new_id), (new_id, ref_id)]
        )


def test_dedup_against_never_pairs_new_with_new(spark):
    from sparkfts.ops.dedup import dedup_against

    ref, new = _split_docs(spark)
    # two identical NEW docs with no ref counterpart must NOT flag
    import pandas as pd

    extra = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [20, 21],
                "text": ["twin new-only content shared by two docs"] * 2,
            }
        )
    )
    new2 = new.unionByName(extra)
    got = {r["doc_id"] for r in dedup_against(new2, ref).collect()}
    assert 20 not in got and 21 not in got
