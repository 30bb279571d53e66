"""ES intervals query: grammar lowering + kernel equivalences."""

from __future__ import annotations

import pytest

from sparkfts.intervals import _lower, intervals_topk_batch


@pytest.fixture(scope="module")
def span_index(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index
    from sparkfts.phrase import build_positions

    d = str(tmp_path_factory.mktemp("intervals_idx"))
    pages = spark.createDataFrame(corpus.to_pandas())
    build_index(pages, d, n_shards=4, n_tbuckets=8)
    build_positions(pages, d)
    return d


def test_lowering_grid():
    assert _lower({"match": {"query": "a b", "ordered": True,
                             "max_gaps": 2}}) == [("a b", True, 2)]
    assert _lower({"match": {"query": "a b", "max_gaps": 0}}) == [
        ("a b", False, 0)
    ]
    got = _lower(
        {"any_of": {"intervals": [
            {"match": {"query": "a b", "ordered": True, "max_gaps": 0}},
            {"match": {"query": "c", "ordered": True, "max_gaps": 0}},
        ]}}
    )
    assert got == [("a b", True, 0), ("c", True, 0)]
    assert _lower(
        {"all_of": {"ordered": True, "max_gaps": 1, "intervals": [
            {"match": {"query": "x"}}, {"match": {"query": "y"}},
        ]}}
    ) == [("x y", True, 1)]


def test_lowering_fail_loud():
    for bad in (
        {"match": {"query": ""}},
        {"match": {"query": "a b"}},  # max_gaps default -1 rejected
        {"match": {"query": "a", "max_gaps": -1}},
        {"any_of": {"intervals": []}},
        {"all_of": {"max_gaps": 1, "intervals": [
            {"match": {"query": "two words"}}]}},
        {"all_of": {"max_gaps": 1, "intervals": [
            {"any_of": {"intervals": []}}]}},
        {"nope": {}},
        {"match": {"query": "a", "max_gaps": 0}, "extra": {}},
    ):
        with pytest.raises(ValueError):
            _lower(bad)


def test_intervals_match_equals_phrase(spark, span_index, corpus):
    from sparkfts.phrase import match_phrase_batch

    text = corpus.column("text").to_pylist()[0]
    from sparkfts.analysis import tokenize

    toks = tokenize(text)
    phrase = " ".join(toks[:2])
    got = intervals_topk_batch(
        spark, span_index,
        [(0, {"match": {"query": phrase, "ordered": True,
                        "max_gaps": 0}}, 10)],
    ).collect()
    exp = match_phrase_batch(
        spark, span_index, [(0, phrase, 10)], slop=0
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in exp
    ]


def test_intervals_unordered_equals_span_near(spark, span_index, corpus):
    from sparkfts.analysis import tokenize
    from sparkfts.spans import span_near_batch

    toks = tokenize(corpus.column("text").to_pylist()[1])
    q = f"{toks[3]} {toks[0]}"
    got = intervals_topk_batch(
        spark, span_index,
        [(0, {"match": {"query": q, "ordered": False,
                        "max_gaps": 2}}, 10)],
    ).collect()
    exp = span_near_batch(
        spark, span_index, [(0, q, 10)], slop=2, in_order=False
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in exp
    ]


def test_intervals_any_of_is_best_alternative(spark, span_index, corpus):
    from sparkfts.phrase import match_phrase_batch

    from sparkfts.analysis import tokenize

    toks0 = tokenize(corpus.column("text").to_pylist()[0])
    toks1 = tokenize(corpus.column("text").to_pylist()[2])
    p1, p2 = " ".join(toks0[:2]), " ".join(toks1[:2])
    got = intervals_topk_batch(
        spark, span_index,
        [(7, {"any_of": {"intervals": [
            {"match": {"query": p1, "ordered": True, "max_gaps": 0}},
            {"match": {"query": p2, "ordered": True, "max_gaps": 0}},
        ]}}, 10)],
    ).collect()
    a = match_phrase_batch(spark, span_index, [(0, p1, 10)]).collect()
    b = match_phrase_batch(spark, span_index, [(0, p2, 10)]).collect()
    best: dict[int, float] = {}
    for r in list(a) + list(b):
        best[r["doc_id"]] = max(best.get(r["doc_id"], 0.0), r["score"])
    exp = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["doc_id"], r["score"]) for r in got] == exp
    assert all(r["query_id"] == 7 for r in got)
    ranks = [r["rank"] for r in got]
    assert ranks == list(range(1, len(ranks) + 1))
