"""ES range + composite aggregations (round-4 additions to aggs.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle.bm25 import BM25Oracle
from sparkfts.aggs import composite_agg, range_agg


@pytest.fixture(scope="module")
def agg_index(spark, pages_df, tmp_path_factory):
    from sparkfts.index import build_index

    d = str(tmp_path_factory.mktemp("agg_idx_r4"))
    build_index(pages_df, d, n_shards=4, n_tbuckets=8)
    return d


@pytest.fixture(scope="module")
def doc_values(spark, pages_df):
    """(doc_id, lang, n_chars) doc-value frame keyed like the index."""
    from sparkfts.tokens import prepare_pages

    return (
        prepare_pages(pages_df)
        .select("doc_id", "url")
        .join(pages_df.select("url", "lang", F.length("text")
                              .alias("n_chars")), "url")
        .select("doc_id", "lang", "n_chars")
    )


@pytest.fixture(scope="module")
def py_oracle(corpus):
    import pandas as pd

    from sparkfts.tokens import sha1_doc_id

    ids = sha1_doc_id(pd.Series(corpus.column("url").to_pylist()))
    return BM25Oracle(zip(ids.tolist(), corpus.column("text").to_pylist()))


def _matched_values(py_oracle, doc_values, query):
    vals = {r["doc_id"]: r for r in doc_values.collect()}
    matched = {d for d, _ in py_oracle.search(query, k=py_oracle.n_docs,
                                              mode="or")}
    return [vals[d] for d in matched]


def test_range_agg_counts(spark, agg_index, doc_values, py_oracle, queries):
    q = queries[0]["query"]
    ranges = [("small", None, 200.0), ("mid", 200.0, 400.0),
              ("large", 400.0, None), ("none", 10_000.0, None)]
    got = range_agg(spark, agg_index, q, doc_values, "n_chars", ranges,
                    mode="or").collect()
    rows = _matched_values(py_oracle, doc_values, q)
    exp = {
        "small": sum(1 for r in rows if r["n_chars"] < 200),
        "mid": sum(1 for r in rows if 200 <= r["n_chars"] < 400),
        "large": sum(1 for r in rows if r["n_chars"] >= 400),
        "none": 0,
    }
    # request order preserved, every range present (zero-count included)
    assert [r["key"] for r in got] == ["small", "mid", "large", "none"]
    assert {r["key"]: r["doc_count"] for r in got} == exp
    with pytest.raises(ValueError):
        range_agg(spark, agg_index, q, doc_values, "n_chars", [])


def test_composite_agg_pagination(
    spark, agg_index, doc_values, py_oracle, queries
):
    q = queries[0]["query"]
    sources = [("lang", "terms", "lang", None),
               ("bucket", "histogram", "n_chars", 100.0)]

    # ground truth: full bucket list, sorted by (lang, bucket)
    rows = _matched_values(py_oracle, doc_values, q)
    from collections import Counter

    cnt = Counter(
        (r["lang"], float(r["n_chars"] // 100 * 100)) for r in rows
    )
    full = sorted(cnt.items())

    # walk pages of 3 until exhausted; concatenation == full list
    walked, after = [], None
    for _ in range(100):
        page = composite_agg(
            spark, agg_index, q, doc_values, sources, size=3,
            after=after, mode="or",
        ).collect()
        if not page:
            break
        assert len(page) <= 3
        walked.extend(page)
        after = {"lang": page[-1]["lang"], "bucket": page[-1]["bucket"]}
    assert [((r["lang"], r["bucket"]), r["doc_count"]) for r in walked] \
        == full

    # one-shot large page equals the same list
    big = composite_agg(
        spark, agg_index, q, doc_values, sources, size=10_000, mode="or"
    ).collect()
    assert [((r["lang"], r["bucket"]), r["doc_count"]) for r in big] == full

    with pytest.raises(ValueError):
        composite_agg(spark, agg_index, q, doc_values, [], size=3)
    with pytest.raises(ValueError):
        composite_agg(
            spark, agg_index, q, doc_values,
            [("b", "histogram", "n_chars", 0)], size=3,
        )
    with pytest.raises(ValueError):
        composite_agg(
            spark, agg_index, q, doc_values,
            [("b", "weird", "n_chars", None)], size=3,
        )


def test_filters_agg_buckets(spark, agg_index, doc_values, py_oracle,
                             queries):
    from sparkfts.aggs import filters_agg

    q = queries[0]["query"]
    filters = [
        ("en", "lang = 'en'"),
        ("longish", "n_chars >= 300"),
        ("nothing", "lang = 'zz'"),
    ]
    got = filters_agg(
        spark, agg_index, q, doc_values, filters, mode="or",
        other_bucket=True,
    ).collect()
    rows = _matched_values(py_oracle, doc_values, q)
    exp = {
        "en": sum(1 for r in rows if r["lang"] == "en"),
        "longish": sum(1 for r in rows if r["n_chars"] >= 300),
        "nothing": 0,
        "_other_": sum(
            1 for r in rows
            if r["lang"] != "en" and r["n_chars"] < 300
        ),
    }
    # every bucket present (zero-count included), request order, counts
    assert [(r["key"], r["doc_count"]) for r in got] == [
        ("en", exp["en"]), ("longish", exp["longish"]),
        ("nothing", 0), ("_other_", exp["_other_"]),
    ]
    # buckets overlap: sum of named buckets + other >= matched count
    assert exp["en"] + exp["longish"] + exp["_other_"] >= len(rows)


def test_filters_agg_validation(spark, agg_index, doc_values):
    from sparkfts.aggs import filters_agg

    with pytest.raises(ValueError, match="non-empty"):
        filters_agg(spark, agg_index, "web", doc_values, [])
    with pytest.raises(ValueError, match="duplicate"):
        filters_agg(spark, agg_index, "web", doc_values,
                    [("a", "lang = 'en'"), ("a", "lang = 'de'")])


def test_missing_agg_null_and_absent(spark, agg_index, doc_values,
                                     py_oracle, queries):
    from sparkfts.aggs import missing_agg

    q = queries[0]["query"]
    rows = _matched_values(py_oracle, doc_values, q)
    # (a) NULL values count as missing
    dv_null = doc_values.select(
        "doc_id", F.expr("nullif(lang, 'en')").alias("lang_opt")
    )
    got = missing_agg(spark, agg_index, q, dv_null, "lang_opt",
                      mode="or").collect()
    assert got[0]["doc_count"] == sum(1 for r in rows if r["lang"] == "en")
    # (b) rows absent from the doc-values frame count as missing too
    dv_partial = doc_values.where("lang <> 'de'").select("doc_id", "lang")
    got2 = missing_agg(spark, agg_index, q, dv_partial, "lang",
                       mode="or").collect()
    assert got2[0]["doc_count"] == sum(1 for r in rows if r["lang"] == "de")
    # (c) nothing missing -> 0 (not null)
    got3 = missing_agg(spark, agg_index, q, doc_values, "lang",
                       mode="or").collect()
    assert got3[0]["doc_count"] == 0
