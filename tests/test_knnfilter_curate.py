"""Filtered/range kNN and the corpus-curation funnel."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def embdf(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=16)], int(i % 4))
        for i in range(300)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


@pytest.fixture(scope="module")
def qvec(embdf):
    return [
        float(x)
        for x in embdf.where("vec_id = 0").collect()[0]["embedding"]
    ]


def _brute(embdf, qvec, pred=None):
    from sparkfts.ops.similarity import np_floor_half

    qi = [np_floor_half(x) for x in qvec]
    nq = sum(v * v for v in qi)
    out = []
    for r in embdf.collect():
        if pred is not None and not pred(r):
            continue
        vi = [np_floor_half(float(x)) for x in r["embedding"]]
        na = sum(v * v for v in vi)
        if na == 0:
            continue
        dot = sum(a * b for a, b in zip(vi, qi))
        cos_e6 = math.floor(
            dot / (math.sqrt(na) * math.sqrt(float(nq))) * 1_000_000
            + 0.5
        )
        out.append((r["vec_id"], cos_e6))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out


def test_cosine_topk_filtered_is_prefilter(spark, embdf, qvec):
    from sparkfts.ops.knnfilter import cosine_topk_filtered

    got = cosine_topk_filtered(
        embdf, qvec, "label = 2", k=10
    ).collect()
    exp = _brute(embdf, qvec, pred=lambda r: r["label"] == 2)[:10]
    assert [(r["vec_id"], r["cos_e6"]) for r in got] == exp
    # pre-filter contract: always k hits when k candidates pass
    assert len(got) == 10


def test_cosine_range_search(spark, embdf, qvec):
    from sparkfts.ops.knnfilter import cosine_range_search

    all_scored = _brute(embdf, qvec)
    thr = all_scored[20][1]
    got = cosine_range_search(embdf, qvec, thr).collect()
    exp = [t for t in all_scored if t[1] >= thr]
    assert [(r["vec_id"], r["cos_e6"]) for r in got] == exp
    capped = cosine_range_search(embdf, qvec, thr, limit=5).collect()
    assert [(r["vec_id"], r["cos_e6"]) for r in capped] == exp[:5]


def test_ann_lsh_topk_filtered(spark, embdf, qvec, tmp_path):
    from sparkfts.ops.knnfilter import ann_lsh_topk_filtered
    from sparkfts.ops.similarity import (
        lsh_bucket,
        probe_buckets,
        query_bucket,
        write_ann_index,
    )

    d = str(tmp_path / "ann")
    write_ann_index(embdf, d, n_planes=6)
    got = ann_lsh_topk_filtered(
        spark, d, embdf, qvec, "label = 1", k=5, probe_hamming=1
    ).collect()
    # ground truth: probed candidate set, filtered, exact cosine
    qb = query_bucket(qvec, 6)
    probed = set(probe_buckets(qb, 6, 1))
    bucket_of = {
        r["vec_id"]: r["bucket"]
        for r in lsh_bucket(embdf, n_planes=6).collect()
    }
    exp = _brute(
        embdf, qvec,
        pred=lambda r: r["label"] == 1
        and bucket_of[r["vec_id"]] in probed,
    )[:5]
    assert [(r["vec_id"], r["cos_e6"]) for r in got] == exp
    assert got, "probe set empty — fixture needs tuning"


def test_curate_funnel(spark):
    from sparkfts.ops.curate import curate_corpus, funnel_df
    from sparkfts.synth import gen_corpus

    pdf = gen_corpus(200, seed=55).to_pandas()
    from sparkfts.tokens import sha1_doc_id

    pdf["doc_id"] = sha1_doc_id(pdf["url"])
    docs = spark.createDataFrame(pdf[["doc_id", "text", "lang"]])
    # inject exact duplicates: re-add 10 docs under new ids
    dups = docs.limit(10).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10**15)
    )
    docs = docs.unionByName(dups)
    eval_df = spark.createDataFrame(
        pdf[["doc_id", "text"]].head(3)
    )  # eval set overlaps 3 training docs entirely

    final, funnel = curate_corpus(
        spark, docs, eval_df=eval_df,
        quality=True, exact=True, neardup=False,
        decontam_n=5, sample_rate_per_mille=500,
    )
    stages = [f["stage"] for f in funnel]
    assert stages == ["input", "quality", "exact_dedup", "decontam",
                      "sample"]
    assert funnel[0]["docs_in"] == 210
    # chain consistency: each stage's in == previous out, monotone down
    for prev, cur in zip(funnel, funnel[1:]):
        assert cur["docs_in"] == prev["docs_out"]
        assert cur["docs_out"] <= cur["docs_in"]
    # exact dedup dropped the injected duplicates that survived quality
    q_out = funnel[1]["docs_out"]
    assert funnel[2]["docs_out"] <= q_out - 1
    # decontamination dropped something (3 exact-overlap docs)
    assert funnel[3]["docs_out"] < funnel[3]["docs_in"]
    # the survivors frame matches the final count
    assert final.count() == funnel[-1]["docs_out"]
    fdf = funnel_df(spark, funnel).orderBy("stage_idx").collect()
    assert [r["stage"] for r in fdf] == stages


def test_curate_neardup_stage(spark):
    from sparkfts.ops.curate import curate_corpus

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "totally different content words here right now ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    final, funnel = curate_corpus(
        spark, docs, quality=False, exact=False, neardup=True,
    )
    assert {r["doc_id"] for r in final.collect()} == {1, 3}
    nd = [f for f in funnel if f["stage"] == "neardup_dedup"][0]
    assert (nd["docs_in"], nd["docs_out"]) == (3, 2)
