"""_rank_eval metrics vs hand-computed values over the engine's own
top-k output."""

from __future__ import annotations

import math

import pytest

from sparkfts.rankeval import rank_eval


@pytest.fixture(scope="module")
def re_index(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index

    d = str(tmp_path_factory.mktemp("re_idx"))
    build_index(
        spark.createDataFrame(corpus.to_pandas()), d,
        n_shards=4, n_tbuckets=8,
    )
    return d


def _hand(spark, re_index, requests, ratings_rows, metric, thr=1):
    """Recompute the metric from the engine's own ranked output."""
    from sparkfts.query import bm25_index_batch

    res = bm25_index_batch(spark, re_index, requests, mode="or").collect()
    by_q: dict[int, list[int]] = {}
    for r in sorted(res, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    rating = {(q, d): g for q, d, g in ratings_rows}
    out = {}
    for qid, _, _k in requests:
        docs = by_q.get(qid, [])
        gains = [rating.get((qid, d), 0) for d in docs]
        rel = [1 if g >= thr else 0 for g in gains]
        if metric == "precision":
            out[qid] = sum(rel) / len(rel) if rel else 0.0
        elif metric == "recall":
            n_rel = sum(1 for (q, _), g in rating.items()
                        if q == qid and g >= thr)
            out[qid] = sum(rel) / n_rel if n_rel else 0.0
        elif metric == "mrr":
            out[qid] = next(
                (1.0 / (i + 1) for i, x in enumerate(rel) if x), 0.0
            )
        else:
            out[qid] = sum(
                (2.0 ** g - 1.0) / math.log2(i + 2)
                for i, g in enumerate(gains)
            )
    return out


@pytest.mark.parametrize("metric", ["precision", "recall", "mrr", "dcg"])
def test_rank_eval_metrics(spark, re_index, corpus, metric):
    from sparkfts.query import bm25_index_batch

    requests = [(0, "the data", 10), (1, "of system", 10),
                (2, "zzz-nomatch-zzz", 10)]
    # deterministic ratings: rate the engine's own odd-ranked hits 1,
    # rank-1 hits 2 (graded gains exercise dcg), plus noise docs
    res = bm25_index_batch(spark, re_index, requests[:2],
                           mode="or").collect()
    ratings_rows = []
    for r in res:
        if r["rank"] == 1:
            ratings_rows.append((r["query_id"], r["doc_id"], 2))
        elif r["rank"] % 2 == 1:
            ratings_rows.append((r["query_id"], r["doc_id"], 1))
    ratings_rows.append((0, 999999, 1))  # relevant but never retrieved
    ratings = spark.createDataFrame(
        ratings_rows, "query_id int, doc_id long, rating int"
    )
    got = {
        r["query_id"]: r["metric_value"]
        for r in rank_eval(spark, re_index, requests, ratings,
                           metric=metric).collect()
    }
    want = _hand(spark, re_index, requests, ratings_rows, metric)
    assert set(got) == {0, 1, 2}
    for q in (0, 1, 2):
        assert math.isclose(got[q], want.get(q, 0.0), rel_tol=1e-12), (
            metric, q, got[q], want.get(q),
        )
    assert got[2] == 0.0  # zero-hit request still reported


def test_rank_eval_guards(spark, re_index):
    ratings = spark.createDataFrame(
        [], "query_id int, doc_id long, rating int"
    )
    with pytest.raises(ValueError, match="metric"):
        rank_eval(spark, re_index, [(0, "the", 5)], ratings,
                  metric="ndcg@10")
