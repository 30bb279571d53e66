"""Score-shaping queries: rank_feature, decay function_score,
boosting, constant_score, min_score.

Each op is checked against a brute-force composition of the
oracle-pinned full match set (``bm25_index_batch`` with k = corpus
size) and a python mirror of the pinned score function.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkfts.analysis import tokenize
from sparkfts.index import build_index
from sparkfts.query import bm25_index_batch
from sparkfts.synth import gen_corpus
from sparkfts.tokens import sha1_doc_id


@pytest.fixture(scope="module")
def sccorpus():
    return gen_corpus(300, seed=123)


@pytest.fixture(scope="module")
def scidx(spark, sccorpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scoring") / "idx")
    pages = spark.createDataFrame(sccorpus.to_pandas()).withColumn(
        "nch", F.length("text").cast("long")
    )
    build_index(pages, d, n_shards=4, n_tbuckets=8, docvalue_cols=["nch"])
    return d


@pytest.fixture(scope="module")
def nch_of(sccorpus):
    pdf = sccorpus.to_pandas()
    ids = sha1_doc_id(pdf["url"])
    return {int(i): len(t) for i, t in zip(ids, pdf["text"])}


def _query(corpus, nterms=2):
    from collections import Counter

    c: Counter = Counter()
    for t in corpus.column("text").to_pylist():
        c.update(set(tokenize(t)))
    return " ".join(t for t, _ in c.most_common(nterms))


def _full(spark, idx, q, mode):
    rows = bm25_index_batch(
        spark, idx, [(0, q, 10_000)], mode=mode
    ).collect()
    return {r["doc_id"]: r["score"] for r in rows}


def _expected_topk(score_of: dict[int, float], k: int):
    return sorted(score_of.items(), key=lambda t: (-t[1], t[0]))[:k]


def test_rank_feature_functions(spark, scidx, sccorpus, nch_of):
    from sparkfts.scoring import rank_feature_batch, rank_feature_fn

    q = _query(sccorpus)
    matched = _full(spark, scidx, q, "and")
    assert len(matched) > 20, "fixture too sparse"
    import numpy as np

    for function, kw in [
        ("saturation", {"pivot": 120.0}),
        ("log", {"scaling": 1.0}),
        ("sigmoid", {"pivot": 120.0, "exponent": 2.0}),
    ]:
        fn = rank_feature_fn(function, **kw)
        exp_scores = {
            d: s + 0.7 * float(fn(np.array([float(nch_of[d])]))[0])
            for d, s in matched.items()
        }
        exp = _expected_topk(exp_scores, 10)
        got = rank_feature_batch(
            spark, scidx, [(0, q, 10)], "nch", function,
            boost=0.7, mode="and", **kw,
        ).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in exp], function
        for r, (_, es) in zip(got, exp):
            assert math.isclose(r["score"], es, rel_tol=1e-9), function


def test_decay_functions(spark, scidx, sccorpus, nch_of):
    from sparkfts.scoring import decay_fn, decay_score_batch

    q = _query(sccorpus)
    matched = _full(spark, scidx, q, "and")
    import numpy as np

    origin = float(np.median([v for v in nch_of.values()]))
    for function in ("gauss", "exp", "linear"):
        fn = decay_fn(function, scale=80.0, decay=0.5, offset=10.0)
        exp_scores = {
            d: s * float(fn(np.array([abs(nch_of[d] - origin)]))[0])
            for d, s in matched.items()
        }
        exp = _expected_topk(exp_scores, 10)
        got = decay_score_batch(
            spark, scidx, [(0, q, 10)], "nch", function,
            origin=origin, scale=80.0, offset=10.0, decay=0.5,
            mode="and",
        ).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in exp], function
        for r, (_, es) in zip(got, exp):
            assert math.isclose(r["score"], es, rel_tol=1e-9), function


def test_decay_missing_field_is_neutral(spark, sccorpus, tmp_path):
    """Docs with a NULL value keep their BM25 score (ES-pinned)."""
    from sparkfts.scoring import decay_score_batch

    d = str(tmp_path / "idx")
    pages = spark.createDataFrame(sccorpus.to_pandas()).withColumn(
        "maybe",
        F.when(F.length("text") % 2 == 0, F.length("text")).cast("long"),
    )
    build_index(pages, d, n_shards=2, n_tbuckets=4, docvalue_cols=["maybe"])
    q = _query(sccorpus)
    matched = _full(spark, d, q, "and")
    got = decay_score_batch(
        spark, d, [(0, q, len(matched))], "maybe", "gauss",
        origin=0.0, scale=1.0, mode="and",
    ).collect()
    # every matched doc survives; NULL-value docs score exactly BM25
    by_id = {r["doc_id"]: r["score"] for r in got}
    assert set(by_id) == set(matched)
    neutral = [d_ for d_ in matched if by_id[d_] == matched[d_]]
    assert neutral, "expected some missing-value docs"


def test_boosting(spark, scidx, sccorpus):
    from sparkfts.scoring import boosting_batch

    q = _query(sccorpus, 2)
    neg = _query(sccorpus, 3).split()[2]
    matched = _full(spark, scidx, q, "and")
    neg_ids = set(_full(spark, scidx, neg, "or"))
    assert 0 < len(neg_ids & set(matched)) < len(matched), "fixture"
    exp_scores = {
        d: s * (0.4 if d in neg_ids else 1.0)
        for d, s in matched.items()
    }
    exp = _expected_topk(exp_scores, 10)
    got = boosting_batch(
        spark, scidx, [(0, q, neg, 10)], negative_boost=0.4, mode="and",
    ).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, es) in zip(got, exp):
        assert math.isclose(r["score"], es, rel_tol=1e-9)


def test_constant_score(spark, scidx, sccorpus):
    from sparkfts.scoring import constant_score_batch

    q = _query(sccorpus)
    matched = sorted(_full(spark, scidx, q, "and"))
    got = constant_score_batch(
        spark, scidx, [(0, q, 7)], boost=1.3, mode="and"
    ).collect()
    assert [r["doc_id"] for r in got] == matched[:7]
    assert all(r["score"] == 1.3 for r in got)
    assert [r["rank"] for r in got] == list(range(1, 8))


def test_min_score_filter(spark, scidx, sccorpus):
    from sparkfts.scoring import min_score_filter

    q = _query(sccorpus)
    ranked = bm25_index_batch(spark, scidx, [(0, q, 50)], mode="and")
    rows = ranked.collect()
    floor = rows[len(rows) // 2]["score"]
    got = min_score_filter(ranked, floor).collect()
    exp = [r for r in rows if r["score"] >= floor]
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in exp]
