"""Tests for sparkfts/hybrid.py: RRF fusion semantics + end-to-end
hybrid retrieval vs a brute-force Python composition."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from sparkfts.session import get_spark

    s = get_spark(cores=4, app_name="test-hybrid")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_rrf_fuse_ground_truth(spark):
    from sparkfts.hybrid import rrf_fuse

    r1 = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11), (0, 3, 12)],
        "query_id int, rank int, doc_id long",
    )
    r2 = spark.createDataFrame(
        [(0, 1, 11), (0, 2, 13)], "query_id int, rank int, doc_id long"
    )
    got = {r["doc_id"]: r for r in rrf_fuse([r1, r2], k=10).collect()}
    assert got[11]["rrf_score"] == pytest.approx(1 / 61 + 1 / 62, abs=0)
    assert got[10]["rrf_score"] == pytest.approx(1 / 61, abs=0)
    assert got[13]["rrf_score"] == pytest.approx(1 / 62, abs=0)
    # doc 11 appears in both systems -> wins
    assert got[11]["rank"] == 1
    # ties (10 vs none): 10 at 1/61 beats 13 and 12
    ranks = sorted((r["rank"], d) for d, r in got.items())
    assert [d for _, d in ranks] == [11, 10, 13, 12]


def test_rrf_fuse_weights_and_validation(spark):
    from sparkfts.hybrid import rrf_fuse

    r1 = spark.createDataFrame(
        [(0, 1, 10)], "query_id int, rank int, doc_id long"
    )
    r2 = spark.createDataFrame(
        [(0, 1, 20)], "query_id int, rank int, doc_id long"
    )
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse([r1, r2], weights=[2.0, 1.0]).collect()
    }
    assert got[10] == pytest.approx(2 / 61, abs=0)
    assert got[20] == pytest.approx(1 / 61, abs=0)
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([r1], weights=[1.0, 2.0])


def test_hybrid_matches_bruteforce(spark, tmp_path):
    """End-to-end: hybrid_rrf_topk == python RRF over the two legs'
    independent rankings (oracle BM25 + exact cosine)."""
    import numpy as np
    import pandas as pd

    from oracle.bm25 import BM25Oracle
    from sparkfts.hybrid import hybrid_rrf_topk
    from sparkfts.index import build_index
    from sparkfts.synth import gen_corpus

    pdf = gen_corpus(300, seed=11).to_pandas()
    from sparkfts.tokens import sha1_doc_id

    pdf["doc_id"] = sha1_doc_id(pdf["url"])
    pages = spark.createDataFrame(pdf[["url", "text"]])
    idx = str(tmp_path / "idx")
    build_index(pages, idx, n_shards=4, n_tbuckets=4)

    rng = np.random.RandomState(3)
    vecs = rng.randn(len(pdf), 8).astype("float64")
    emb_pdf = pd.DataFrame(
        {"vec_id": pdf["doc_id"], "embedding": list(map(list, vecs))}
    )
    emb = spark.createDataFrame(emb_pdf)
    qvec = list(vecs[0])

    query = "data table"
    got = hybrid_rrf_topk(
        spark, idx, emb, [(0, query, qvec)], k=10, depth=50, mode="or"
    ).collect()

    # brute force: leg rankings independently, python RRF
    oracle = BM25Oracle(zip(pdf["doc_id"].tolist(), pdf["text"].tolist()))
    bm_rank = {
        d: i + 1
        for i, (d, _) in enumerate(oracle.search(query, k=50, mode="or"))
    }
    qi = np.floor(np.asarray(qvec) * 1000 + 0.5)
    vi = np.floor(vecs * 1000 + 0.5)
    na = (vi * vi).sum(axis=1)
    cos = np.where(
        na > 0,
        np.floor(
            (vi @ qi) / (np.sqrt(na) * np.sqrt((qi * qi).sum())) * 1e6 + 0.5
        ),
        np.nan,
    )
    order = sorted(
        (int(d) for d, n in zip(pdf["doc_id"], na) if n > 0),
        key=lambda d: (-cos[pdf.index[pdf["doc_id"] == d][0]], d),
    )[:50]
    ann_rank = {d: i + 1 for i, d in enumerate(order)}
    fused: dict[int, float] = {}
    for d, r in bm_rank.items():
        fused[d] = fused.get(d, 0.0) + 1.0 / (60 + r)
    for d, r in ann_rank.items():
        fused[d] = fused.get(d, 0.0) + 1.0 / (60 + r)
    exp = sorted(fused.items(), key=lambda e: (-e[1], e[0]))[:10]
    got_sorted = sorted(got, key=lambda r: r["rank"])
    assert [r["doc_id"] for r in got_sorted] == [d for d, _ in exp]
    for r, (_, s) in zip(got_sorted, exp):
        assert r["rrf_score"] == pytest.approx(s, rel=1e-12)


def test_linear_fuse_minmax(spark):
    from sparkfts.hybrid import linear_fuse

    lex = spark.createDataFrame(
        [(0, 10, 2.0), (0, 11, 6.0), (0, 12, 4.0)],
        "query_id int, doc_id long, score double",
    )
    vec = spark.createDataFrame(
        [(0, 11, 0.9), (0, 13, 0.5), (0, 10, 0.1)],
        "query_id int, doc_id long, score double",
    )
    got = {
        r["doc_id"]: r["score"]
        for r in linear_fuse([lex, vec], k=10,
                             weights=[1.0, 2.0]).collect()
    }
    # lex minmax over {2,4,6}: 10->0, 11->1, 12->0.5
    # vec minmax over {0.1,0.5,0.9}: 11->1, 13->0.5, 10->0
    assert got[11] == pytest.approx(1.0 + 2.0 * 1.0)
    assert got[12] == pytest.approx(0.5)
    assert got[13] == pytest.approx(2.0 * 0.5)
    assert got[10] == pytest.approx(0.0)


def test_linear_fuse_degenerate_and_validation(spark):
    from sparkfts.hybrid import linear_fuse

    one = spark.createDataFrame(
        [(0, 5, 3.0)], "query_id int, doc_id long, score double"
    )
    rows = linear_fuse([one], k=5).collect()
    # max == min -> pinned 0.0, doc still retrieved
    assert [(r["doc_id"], r["score"]) for r in rows] == [(5, 0.0)]
    with pytest.raises(ValueError):
        linear_fuse([], k=5)
    with pytest.raises(ValueError):
        linear_fuse([one], k=5, weights=[1.0, 2.0])


def test_linear_fuse_per_query_normalization(spark):
    """min/max are per (query, system), never global."""
    from sparkfts.hybrid import linear_fuse

    leg = spark.createDataFrame(
        [(0, 1, 10.0), (0, 2, 20.0), (1, 1, 100.0), (1, 2, 400.0)],
        "query_id int, doc_id long, score double",
    )
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in linear_fuse([leg], k=5).collect()
    }
    assert got[(0, 2)] == pytest.approx(1.0)
    assert got[(1, 2)] == pytest.approx(1.0)
    assert got[(0, 1)] == got[(1, 1)] == 0.0
