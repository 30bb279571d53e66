"""ES extended_stats / weighted_avg / top_metrics / date_range /
adjacency_matrix aggregations."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oracle.bm25 import BM25Oracle


@pytest.fixture(scope="module")
def agg_index(spark, pages_df, tmp_path_factory):
    from sparkfts.index import build_index

    d = str(tmp_path_factory.mktemp("agg_idx_r4b"))
    build_index(pages_df, d, n_shards=4, n_tbuckets=8)
    return d


@pytest.fixture(scope="module")
def doc_values(spark, pages_df):
    from sparkfts.tokens import prepare_pages

    return (
        prepare_pages(pages_df)
        .select("doc_id", "url")
        .join(
            pages_df.select(
                "url", "lang", "warc_ts",
                F.length("text").alias("n_chars"),
            ),
            "url",
        )
        .select(
            "doc_id", "lang", "warc_ts", "n_chars",
            (F.col("doc_id") % 7 + 1).cast("long").alias("wt"),
        )
    )


@pytest.fixture(scope="module")
def py_oracle(corpus):
    import pandas as pd

    from sparkfts.tokens import sha1_doc_id

    ids = sha1_doc_id(pd.Series(corpus.column("url").to_pylist()))
    return BM25Oracle(
        zip(ids.tolist(), corpus.column("text").to_pylist())
    )


def _matched_values(py_oracle, doc_values, query):
    vals = {r["doc_id"]: r for r in doc_values.collect()}
    matched = {
        d
        for d, _ in py_oracle.search(
            query, k=py_oracle.n_docs, mode="or"
        )
    }
    return [vals[d] for d in matched]


def test_extended_stats(spark, agg_index, doc_values, py_oracle, queries):
    from sparkfts.aggs import extended_stats_agg

    q = queries[0]["query"]
    got = extended_stats_agg(
        spark, agg_index, q, doc_values, "n_chars", mode="or"
    ).collect()[0]
    xs = [r["n_chars"] for r in _matched_values(py_oracle, doc_values, q)]
    assert xs, "fixture too sparse"
    assert got["count"] == len(xs)
    assert got["min"] == min(xs) and got["max"] == max(xs)
    assert math.isclose(got["sum"], sum(xs))
    sq = sum(x * x for x in xs)
    avg = sum(xs) / len(xs)
    assert math.isclose(got["sum_of_squares"], sq)
    var = sq / len(xs) - avg * avg  # ES moment formula, population
    assert math.isclose(got["variance"], var, rel_tol=1e-9)
    assert math.isclose(
        got["std_deviation"], math.sqrt(var), rel_tol=1e-9
    )


def test_weighted_avg(spark, agg_index, doc_values, py_oracle, queries):
    from sparkfts.aggs import weighted_avg_agg

    q = queries[0]["query"]
    got = weighted_avg_agg(
        spark, agg_index, q, doc_values, "n_chars", "wt", mode="or"
    ).collect()[0]["value"]
    rows = _matched_values(py_oracle, doc_values, q)
    exp = sum(r["n_chars"] * r["wt"] for r in rows) / sum(
        r["wt"] for r in rows
    )
    assert math.isclose(got, exp, rel_tol=1e-12)


def test_top_metrics(spark, agg_index, doc_values, py_oracle, queries):
    from sparkfts.aggs import top_metrics_agg

    q = queries[0]["query"]
    rows = _matched_values(py_oracle, doc_values, q)
    for ascending in (True, False):
        got = top_metrics_agg(
            spark, agg_index, q, doc_values, "n_chars", "wt",
            ascending=ascending, size=4, mode="or",
        ).collect()
        exp = sorted(
            rows,
            key=lambda r: (
                r["wt"] if ascending else -r["wt"],
                r["doc_id"],
            ),
        )[:4]
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in exp]
        assert [r["sort_value"] for r in got] == [r["wt"] for r in exp]
        assert [r["n_chars"] for r in got] == [
            r["n_chars"] for r in exp
        ]


def test_date_range(spark, agg_index, doc_values, py_oracle, queries):
    from sparkfts.aggs import date_range_agg

    q = queries[0]["query"]
    ranges = [  # synth warc_ts spans ~43 min on 2024-01-01
        ("early", None, "2024-01-01 00:10:00"),
        ("mid", "2024-01-01 00:10:00", "2024-01-01 00:30:00"),
        ("late", "2024-01-01 00:30:00", None),
        ("never", "2030-01-01 00:00:00", None),
    ]
    got = date_range_agg(
        spark, agg_index, q, doc_values, "warc_ts", ranges, mode="or"
    ).collect()
    assert [r["key"] for r in got] == [k for k, _, _ in ranges]
    import datetime as dt

    rows = _matched_values(py_oracle, doc_values, q)

    def n(lo, hi):
        c = 0
        for r in rows:
            ts = r["warc_ts"]
            if lo and ts < dt.datetime.fromisoformat(lo):
                continue
            if hi and ts >= dt.datetime.fromisoformat(hi):
                continue
            c += 1
        return c

    exp = {k: n(lo, hi) for k, lo, hi in ranges}
    assert {r["key"]: r["doc_count"] for r in got} == exp
    assert exp["never"] == 0  # zero-count ranges still reported


def test_adjacency_matrix(spark, agg_index, doc_values, py_oracle, queries):
    from sparkfts.aggs import adjacency_matrix_agg

    q = queries[0]["query"]
    filters = [
        ("en", "lang = 'en'"),
        ("short", "n_chars < 300"),
        ("hw", "wt >= 4"),
    ]
    got = {
        r["key"]: r["doc_count"]
        for r in adjacency_matrix_agg(
            spark, agg_index, q, doc_values, filters, mode="or"
        ).collect()
    }
    rows = _matched_values(py_oracle, doc_values, q)
    preds = {
        "en": lambda r: r["lang"] == "en",
        "short": lambda r: r["n_chars"] < 300,
        "hw": lambda r: r["wt"] >= 4,
    }
    exp = {}
    for k, p in preds.items():
        exp[k] = sum(1 for r in rows if p(r))
    for a, b in [("en", "short"), ("en", "hw"), ("short", "hw")]:
        exp[f"{a}&{b}"] = sum(
            1 for r in rows if preds[a](r) and preds[b](r)
        )
    exp = {k: v for k, v in exp.items() if v > 0}  # ES omits empties
    assert got == exp
    assert list(got) == sorted(got)  # key asc


def test_rare_terms(spark, agg_index, doc_values, py_oracle, queries):
    from collections import Counter

    from sparkfts.aggs import rare_terms

    q = queries[0]["query"]
    counts = Counter(
        r["lang"] for r in _matched_values(py_oracle, doc_values, q)
    )
    for mdc in (1, 2, 5):
        got = rare_terms(
            spark, agg_index, q, doc_values, "lang", mode="or",
            max_doc_count=mdc,
        ).collect()
        exp = sorted(
            ((v, c) for v, c in counts.items() if c <= mdc),
            key=lambda t: (t[1], t[0]),
        )
        assert [(r["value"], r["doc_count"]) for r in got] == exp
    # a giant bound returns every bucket, rarity order
    got_all = rare_terms(
        spark, agg_index, q, doc_values, "lang", mode="or",
        max_doc_count=10**9,
    ).collect()
    assert len(got_all) == len(counts)
    with pytest.raises(ValueError):
        rare_terms(spark, agg_index, q, doc_values, "lang",
                   max_doc_count=0)


def test_auto_date_histogram(spark, agg_index, doc_values, py_oracle,
                             queries):
    from sparkfts.aggs import auto_date_histogram, date_histogram

    q = queries[0]["query"]
    rows = _matched_values(py_oracle, doc_values, q)
    assert rows, "fixture too sparse"

    import pandas as pd

    ts = pd.Series([r["warc_ts"] for r in rows])

    def n_buckets(iv):
        iso = {"minute": "min", "hour": "h", "day": "D"}
        if iv in iso:
            return ts.dt.floor(iso[iv]).nunique()
        if iv == "week":
            return (ts - pd.to_timedelta(
                ts.dt.dayofweek, unit="D")).dt.normalize().nunique()
        per = {"month": "M", "quarter": "Q", "year": "Y"}[iv]
        return ts.dt.to_period(per).nunique()

    ladder = ("minute", "hour", "day", "week", "month", "quarter", "year")
    for target in (1, 3, 10**6):
        exp_iv = next(
            (iv for iv in ladder if n_buckets(iv) <= target), "year"
        )
        got = auto_date_histogram(
            spark, agg_index, q, doc_values, "warc_ts",
            target_buckets=target, mode="or",
        ).collect()
        assert got and all(r["interval"] == exp_iv for r in got)
        assert len(got) == n_buckets(exp_iv)
        assert len(got) <= max(target, 1) or exp_iv == "year"
        # bucket contents equal the fixed-interval histogram
        fixed = date_histogram(
            spark, agg_index, q, doc_values, "warc_ts",
            calendar_interval=exp_iv, mode="or",
        ).collect()
        assert [(r["bucket"], r["doc_count"]) for r in got] == [
            (r["bucket"], r["doc_count"]) for r in fixed
        ]
    with pytest.raises(ValueError):
        auto_date_histogram(spark, agg_index, q, doc_values, "warc_ts",
                            target_buckets=0)


def test_count_matches(spark, agg_index, py_oracle, queries):
    from sparkfts.aggs import count_matches

    q = queries[0]["query"]
    exp = {
        mode: len(py_oracle.search(q, k=py_oracle.n_docs, mode=mode))
        for mode in ("and", "or")
    }
    for mode in ("and", "or"):
        got = count_matches(spark, agg_index, [(0, q)], mode=mode).collect()
        assert [(r["query_id"], r["doc_count"]) for r in got] == [
            (0, exp[mode])
        ]
    # batch: every query gets a row; no-match and empty-analysis -> 0
    got = count_matches(
        spark, agg_index,
        [(0, q), (1, "zzzzqq"), (2, "...")], mode="or",
    ).collect()
    assert [(r["query_id"], r["doc_count"]) for r in got] == [
        (0, exp["or"]), (1, 0), (2, 0)
    ]


def test_multi_terms_agg(spark, agg_index, doc_values, py_oracle, queries):
    from sparkfts.aggs import multi_terms_agg

    q = queries[0]["query"]
    rows = multi_terms_agg(
        spark, agg_index, q, doc_values, ["lang", "wt"], mode="or",
        size=100,
    ).collect()
    exp: dict[str, int] = {}
    for r in _matched_values(py_oracle, doc_values, q):
        k = f"{r['lang']}|{r['wt']}"
        exp[k] = exp.get(k, 0) + 1
    got = {r["key"]: r["doc_count"] for r in rows}
    assert got == exp
    # order: count desc, key asc; size bound
    keys = [(r["key"], r["doc_count"]) for r in rows]
    assert keys == sorted(keys, key=lambda kv: (-kv[1], kv[0]))
    top2 = multi_terms_agg(
        spark, agg_index, q, doc_values, ["lang", "wt"], mode="or", size=2
    ).collect()
    assert [(r["key"], r["doc_count"]) for r in top2] == keys[:2]
    with pytest.raises(ValueError):
        multi_terms_agg(spark, agg_index, q, doc_values, ["lang"])


def test_multi_terms_skips_missing(spark, agg_index, py_oracle, queries,
                                   doc_values):
    """ES multi_terms drops docs missing ANY keyed field."""
    from sparkfts.aggs import multi_terms_agg

    dv = doc_values.withColumn(
        "lang",
        F.when(F.col("doc_id") % 3 == 0, None).otherwise(F.col("lang")),
    )
    q = queries[0]["query"]
    rows = multi_terms_agg(
        spark, agg_index, q, dv, ["lang", "wt"], mode="or", size=1000
    ).collect()
    exp: dict[str, int] = {}
    for r in _matched_values(py_oracle, doc_values, q):
        if r["doc_id"] % 3 == 0:
            continue
        k = f"{r['lang']}|{r['wt']}"
        exp[k] = exp.get(k, 0) + 1
    assert {r["key"]: r["doc_count"] for r in rows} == exp


def test_global_agg(spark, agg_index, doc_values, py_oracle):
    from sparkfts.aggs import global_agg

    got = global_agg(spark, agg_index, doc_values, "n_chars").collect()[0]
    xs = [r["n_chars"] for r in doc_values.collect()]
    assert got["n"] == len(xs)
    assert got["min_v"] == min(xs) and got["max_v"] == max(xs)
    assert got["sum_v"] == sum(xs)


def test_global_agg_respects_tombstones(spark, pages_df, doc_values,
                                        tmp_path_factory):
    from sparkfts.aggs import global_agg
    from sparkfts.deletes import delete_docs
    from sparkfts.index import build_index

    d = str(tmp_path_factory.mktemp("glob_del_idx"))
    build_index(pages_df, d, n_shards=2, n_tbuckets=4)
    vals = doc_values.collect()
    victim = vals[0]["doc_id"]
    delete_docs(spark, d, [int(victim)])
    got = global_agg(spark, d, doc_values, "n_chars").collect()[0]
    rest = [r["n_chars"] for r in vals if r["doc_id"] != victim]
    assert got["n"] == len(rest)
    assert got["sum_v"] == sum(rest)


def test_boxplot_agg(spark, agg_index, doc_values, py_oracle, queries):
    import numpy as np

    from sparkfts.aggs import boxplot_agg

    q = queries[0]["query"]
    got = boxplot_agg(
        spark, agg_index, q, doc_values, "n_chars", mode="or"
    ).collect()[0]
    xs = np.array(sorted(
        r["n_chars"] for r in _matched_values(py_oracle, doc_values, q)
    ), dtype=float)
    q1, q2, q3 = np.percentile(xs, [25, 50, 75])
    assert got["min_v"] == xs.min() and got["max_v"] == xs.max()
    assert got["q1"] == pytest.approx(q1)
    assert got["q2"] == pytest.approx(q2)
    assert got["q3"] == pytest.approx(q3)
    iqr = q3 - q1
    assert got["lower"] == xs[xs >= q1 - 1.5 * iqr].min()
    assert got["upper"] == xs[xs <= q3 + 1.5 * iqr].max()
    assert got["lower"] >= got["min_v"] and got["upper"] <= got["max_v"]


def test_t_test_agg(spark, agg_index, doc_values, py_oracle, queries):
    import math

    from sparkfts.aggs import t_test_agg

    q = queries[0]["query"]
    got = t_test_agg(
        spark, agg_index, q, doc_values, "n_chars",
        "doc_id % 2 = 0", mode="or",
    ).collect()[0]
    a = [r["n_chars"] for r in _matched_values(py_oracle, doc_values, q)
         if r["doc_id"] % 2 == 0]
    b = [r["n_chars"] for r in _matched_values(py_oracle, doc_values, q)
         if r["doc_id"] % 2 != 0]
    assert (got["n_a"], got["n_b"]) == (len(a), len(b))
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    t = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))
    assert got["t_value"] == pytest.approx(t, rel=1e-12)
    with pytest.raises(ValueError):
        t_test_agg(spark, agg_index, q, doc_values, "n_chars",
                   "doc_id < 0", mode="or")
