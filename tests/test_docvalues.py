"""Doc-value query ops: ES sort / function_score / collapse / top_hits.

Each op is checked against a brute-force composition of the already
oracle-pinned full match set (``bm25_index_batch`` with k = corpus
size) and the corpus's own doc values.
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
def dvcorpus():
    return gen_corpus(300, seed=77)


@pytest.fixture(scope="module")
def dvidx(spark, dvcorpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("docvals") / "idx")
    pages = spark.createDataFrame(dvcorpus.to_pandas()).withColumn(
        "nch", F.length("text").cast("long")
    )
    build_index(
        pages, d, n_shards=4, n_tbuckets=8, docvalue_cols=["lang", "nch"]
    )
    return d


@pytest.fixture(scope="module")
def dvals(dvcorpus):
    """doc_id -> (lang, nch)."""
    pdf = dvcorpus.to_pandas()
    ids = sha1_doc_id(pdf["url"])
    return {
        int(i): (lang, len(t))
        for i, lang, t in zip(ids, pdf["lang"], pdf["text"])
    }


def _query(dvcorpus, nterms=2):
    from collections import Counter

    c: Counter = Counter()
    for t in dvcorpus.column("text").to_pylist():
        c.update(set(tokenize(t)))
    return " ".join(t for t, _ in c.most_common(nterms))


def _full(spark, dvidx, q, mode):
    rows = bm25_index_batch(spark, dvidx, [(0, q, 10_000)], mode=mode).collect()
    return {r["doc_id"]: r["score"] for r in rows}


def test_sort_by_field(spark, dvidx, dvcorpus, dvals):
    from sparkfts.docvalues import sort_by_field_batch

    q = _query(dvcorpus)
    matched = _full(spark, dvidx, q, "and")
    assert len(matched) > 20, "fixture too sparse"
    for ascending in (True, False):
        got = sort_by_field_batch(
            spark, dvidx, [(0, q, 15)], "nch", ascending=ascending
        ).collect()
        exp = sorted(
            ((dvals[d][1], d) for d in matched),
            key=lambda t: (t[0] if ascending else -t[0], t[1]),
        )[:15]
        assert [(r["sort_value"], r["doc_id"]) for r in got] == exp
        assert [r["rank"] for r in got] == list(range(1, len(exp) + 1))


def test_sort_batch_multiquery(spark, dvidx, dvcorpus, dvals):
    from sparkfts.docvalues import sort_by_field_batch

    qs = [(7, _query(dvcorpus, 1), 5), (9, _query(dvcorpus, 3), 5)]
    got = sort_by_field_batch(spark, dvidx, qs, "nch", ascending=True).collect()
    for qid, q, k in qs:
        matched = _full(spark, dvidx, q, "and")
        exp = sorted(((dvals[d][1], d) for d in matched))[:k]
        rows = [r for r in got if r["query_id"] == qid]
        assert [(r["sort_value"], r["doc_id"]) for r in rows] == exp


def test_function_score(spark, dvidx, dvcorpus, dvals):
    from sparkfts.docvalues import function_score_batch

    q = _query(dvcorpus)
    matched = _full(spark, dvidx, q, "or")
    got = function_score_batch(
        spark, dvidx, [(0, q, 20)], "nch", modifier="log1p", mode="or"
    ).collect()
    exp = sorted(
        (
            (s * math.log1p(dvals[d][1]), d)
            for d, s in matched.items()
        ),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    assert [r["doc_id"] for r in got] == [d for _s, d in exp]
    for r, (s, _d) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_collapse(spark, dvidx, dvcorpus, dvals):
    from sparkfts.docvalues import collapse_batch

    q = _query(dvcorpus)
    matched = _full(spark, dvidx, q, "or")
    best: dict[str, tuple[float, int]] = {}
    for d, s in matched.items():
        lang = dvals[d][0]
        cur = best.get(lang)
        if cur is None or (-s, d) < (-cur[0], cur[1]):
            best[lang] = (s, d)
    exp = sorted(
        ((s, d, v) for v, (s, d) in best.items()),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = collapse_batch(spark, dvidx, [(0, q, 10)], "lang", mode="or").collect()
    assert [(r["doc_id"], r["collapse_value"]) for r in got] == [
        (d, v) for _s, d, v in exp
    ]
    for r, (s, _d, _v) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-9)
    # one hit per collapse value
    vals = [r["collapse_value"] for r in got]
    assert len(vals) == len(set(vals))


def test_terms_top_hits(spark, dvidx, dvcorpus, dvals):
    from sparkfts.docvalues import terms_top_hits

    q = _query(dvcorpus)
    matched = _full(spark, dvidx, q, "or")
    per_bucket: dict[str, list[tuple[float, int]]] = {}
    for d, s in matched.items():
        per_bucket.setdefault(dvals[d][0], []).append((s, d))
    buckets = sorted(
        ((len(v), k) for k, v in per_bucket.items()),
        key=lambda t: (-t[0], t[1]),
    )[:3]
    got = terms_top_hits(
        spark, dvidx, q, "lang", size=3, hits=2, mode="or"
    ).collect()
    exp_rows = []
    for cnt, val in buckets:
        top = sorted(per_bucket[val], key=lambda t: (-t[0], t[1]))[:2]
        for i, (s, d) in enumerate(top, 1):
            exp_rows.append((val, cnt, i, d, s))
    assert [
        (r["value"], r["doc_count"], r["hit_rank"], r["doc_id"]) for r in got
    ] == [(v, c, i, d) for v, c, i, d, _s in exp_rows]
    for r, (_v, _c, _i, _d, s) in zip(got, exp_rows):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_sort_empty_query(spark, dvidx):
    from sparkfts.docvalues import sort_by_field_batch

    got = sort_by_field_batch(spark, dvidx, [(0, "", 5)], "nch").collect()
    assert got == []


# ---- ES script_score (pinned arithmetic DSL, sparkfts.scripting) ----


def test_script_dsl_parse_and_eval():
    import numpy as np

    from sparkfts.scripting import compile_script, parse_script

    s = np.array([1.0, 2.0, 4.0])
    v = np.array([0.0, 10.0, 100.0])
    cases = [
        ("_score", s),
        ("_score * 2 + 1", s * 2 + 1),
        ("-_score / (1 + value)", -s / (1 + v)),
        ("log1p(value) * _score", np.log1p(v) * s),
        ("max(_score, sqrt(value))", np.maximum(s, np.sqrt(v))),
        ("pow(value, 0.5) - min(_score, 1.5)",
         np.power(v, 0.5) - np.minimum(s, 1.5)),
        ("1 - 2 - 3", -4.0),  # left association
        ("2e1 + 1.5", 21.5),
    ]
    for src, exp in cases:
        got = compile_script(src)({"_score": s, "value": v})
        assert np.ravel(got).tolist() == pytest.approx(
            np.ravel(exp).tolist()
        ), src

    for bad in ("", "_score +", "foo(2)", "doc['f']", "min(1)",
                "_score ** 2", "1 2", "(1", "score"):
        with pytest.raises(ValueError):
            parse_script(bad)


def test_script_score_matches_brute(spark, dvidx, dvcorpus, dvals):
    from sparkfts.docvalues import script_score_batch

    q = _query(dvcorpus)
    matched = _full(spark, dvidx, q, "or")
    script = "_score * (0.5 + value / (value + 10))"
    got = script_score_batch(
        spark, dvidx, [(0, q, 12)], "nch", script, mode="or"
    ).collect()
    exp = sorted(
        ((d, s * (0.5 + dvals[d][1] / (dvals[d][1] + 10)))
         for d, s in matched.items()),
        key=lambda t: (-t[1], t[0]),
    )[:12]
    assert [(r["doc_id"]) for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-12)
    assert [r["rank"] for r in got] == list(range(1, len(exp) + 1))


def test_script_score_equals_function_score_when_equivalent(
    spark, dvidx, dvcorpus
):
    """script '_score * log1p(value)' is field_value_factor log1p
    factor=1 — identical pages and float64 scores."""
    from sparkfts.docvalues import function_score_batch, script_score_batch

    q = _query(dvcorpus)
    a = script_score_batch(
        spark, dvidx, [(0, q, 10)], "nch", "_score * log1p(value)",
        mode="or",
    ).collect()
    b = function_score_batch(
        spark, dvidx, [(0, q, 10)], "nch", modifier="log1p", mode="or"
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_script_score_bad_script_fails_before_spark(spark, dvidx):
    from sparkfts.docvalues import script_score_batch

    with pytest.raises(ValueError, match="unknown script name"):
        script_score_batch(spark, dvidx, [(0, "x", 5)], "nch", "bogus + 1")


# ---- ES terms_set (per-doc minimum_should_match from a doc value) ----


def test_terms_set_matches_brute(spark, dvidx, dvcorpus, dvals):
    from collections import Counter

    from sparkfts.docvalues import terms_set_batch

    c: Counter = Counter()
    for t in dvcorpus.column("text").to_pylist():
        c.update(set(tokenize(t)))
    terms = [t for t, _ in c.most_common(3)]
    q = " ".join(terms)
    matched = _full(spark, dvidx, q, "or")

    # per-doc distinct-term counts from the corpus
    texts = dvcorpus.column("text").to_pylist()
    import pandas as pd

    from sparkfts.tokens import sha1_doc_id

    ids = sha1_doc_id(
        pd.Series(dvcorpus.column("url").to_pylist())
    ).tolist()
    nmatch = {
        d: sum(1 for t in terms if t in set(tokenize(txt)))
        for d, txt in zip(ids, texts)
    }
    exp = sorted(
        (
            (d, s)
            for d, s in matched.items()
            if (d % 4) >= 1 and nmatch[d] >= min(d % 4, len(terms))
        ),
        key=lambda t: (-t[1], t[0]),
    )[:12]
    got = terms_set_batch(
        spark, dvidx, [(0, q, 12)], "pmod(doc_id, 4)"
    ).collect()
    assert exp, "fixture too sparse"
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (d, pytest.approx(s, rel=1e-12)) for d, s in exp
    ]
    # required > n_terms caps at n_terms (docs with all 3 terms match
    # even where doc_id % 4 == 3 == n_terms)
    assert any(nmatch[r["doc_id"]] == 3 for r in got) or all(
        (r["doc_id"] % 4) < 3 for r in got
    )


def test_terms_set_required_zero_never_matches(spark, dvidx, dvcorpus):
    from collections import Counter

    from sparkfts.docvalues import terms_set_batch

    c: Counter = Counter()
    for t in dvcorpus.column("text").to_pylist():
        c.update(set(tokenize(t)))
    q = " ".join(t for t, _ in c.most_common(2))
    got = terms_set_batch(spark, dvidx, [(0, q, 100)], "0").collect()
    assert got == []


# ---- distance_feature + random_score ----


def test_distance_feature_matches_script(spark, dvidx, dvcorpus):
    from sparkfts.docvalues import (
        distance_feature_batch,
        script_score_batch,
    )

    q = " ".join(tokenize(dvcorpus.column("text").to_pylist()[0])[:2])
    a = distance_feature_batch(
        spark, dvidx, [(0, q, 10)], "nch",
        origin=500.0, pivot=200.0, boost=0.8, mode="or",
    ).collect()
    b = script_score_batch(
        spark, dvidx, [(0, q, 10)], "nch",
        "_score + 0.8 * (200.0 / (200.0 + abs(value - 500.0)))",
        mode="or",
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert a, "fixture must match"
    with pytest.raises(ValueError):
        distance_feature_batch(
            spark, dvidx, [(0, q, 10)], "nch",
            origin=0.0, pivot=0.0,
        )


def test_random_score_deterministic(spark, dvidx, dvcorpus):
    from sparkfts.docvalues import random_score_batch

    q = " ".join(tokenize(dvcorpus.column("text").to_pylist()[0])[:2])
    a = random_score_batch(spark, dvidx, [(0, q, 10)], seed=7,
                           mode="or").collect()
    b = random_score_batch(spark, dvidx, [(0, q, 10)], seed=7,
                           mode="or").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    c = random_score_batch(spark, dvidx, [(0, q, 10)], seed=8,
                           mode="or").collect()
    assert [r["doc_id"] for r in a] != [r["doc_id"] for r in c]
    # python mirror of the pinned LCG
    P, A, B = 2_147_483_647, 1_103_515_245, 12_345
    s = 7 % P
    for r in a:
        h = ((r["doc_id"] % P) * A + B + s * 12_345) % P
        h = (h * A + B) % P
        assert r["score"] == pytest.approx(h / P, abs=0)
    assert all(0.0 <= r["score"] < 1.0 for r in a)


def test_sort_search_after_pages(spark, dvidx, dvcorpus):
    """r5: field-sorted deep pagination — pages stitched via
    search_after equal one big sorted page, both directions."""
    from sparkfts.docvalues import sort_by_field_batch

    q = _query(dvcorpus)
    for ascending in (True, False):
        full = sort_by_field_batch(
            spark, dvidx, [(0, q, 15)], "nch", mode="and",
            ascending=ascending,
        ).collect()
        assert len(full) == 15, "premise: enough matches to paginate"
        pages = []
        cursor = None
        for _ in range(3):
            page = sort_by_field_batch(
                spark, dvidx, [(0, q, 5)], "nch", mode="and",
                ascending=ascending,
                search_after={0: cursor} if cursor else None,
            ).collect()
            assert len(page) == 5
            pages.extend(page)
            last = page[-1]
            cursor = (last["sort_value"], last["doc_id"])
        assert [(r["doc_id"], r["sort_value"]) for r in pages] == [
            (r["doc_id"], r["sort_value"]) for r in full
        ], ascending
