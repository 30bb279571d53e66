"""significant_text + scripted_metric + terms-lookup (r4 VERDICT #5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkfts.aggs import scripted_metric, significant_terms, significant_text
from sparkfts.lifecycle import terms_lookup_expr, terms_lookup_values


@pytest.fixture(scope="module")
def src_index(spark, pages_df, tmp_path_factory):
    from sparkfts.index import build_index

    idx = str(tmp_path_factory.mktemp("stl") / "idx")
    build_index(
        pages_df.withColumn("tag", (F.col("warc_ts").cast("long") % 3)
                            .cast("string")),
        idx, n_shards=4, n_tbuckets=8, store_source=True,
        docvalue_cols=["lang", "tag"],
    )
    return idx


def test_significant_text_matches_terms_over_same_analysis(
    spark, src_index, queries
):
    """With the index analyzer == re-analysis (no expander/subset
    difference), significant_text's (term, df_fg, df_bg) must agree
    with significant_terms — the postings path and the re-analysis
    path count the same thing."""
    q = queries[0]["query"].split()[0]
    a = significant_text(spark, src_index, q, mode="or", size=50,
                         min_doc_count=2).collect()
    b = significant_terms(spark, src_index, q, mode="or", size=50,
                          min_doc_count=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert a, "premise: the query matches docs"


def test_significant_text_explicit_pages(spark, src_index, pages_df, queries):
    q = queries[0]["query"].split()[0]
    from sparkfts.tokens import prepare_pages

    pages = prepare_pages(pages_df)
    a = significant_text(spark, src_index, q, mode="or", size=10,
                         min_doc_count=2, pages=pages).collect()
    b = significant_text(spark, src_index, q, mode="or", size=10,
                         min_doc_count=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_scripted_metric_combines(spark, src_index, queries):
    q = queries[0]["query"].split()[0]
    row = scripted_metric(
        spark, src_index, q, map_script="doclen * 2 + 1", combine="max",
        mode="or", fields=["doclen"],
    ).collect()[0]
    # brute mirror over the match set
    from sparkfts.aggs import match_docs_batch
    from sparkfts.index import load_docmap

    matched = match_docs_batch(spark, src_index, [(0, q)], "or").select(
        "doc_id"
    )
    dls = [
        r["doclen"]
        for r in load_docmap(spark, src_index)
        .join(matched, "doc_id")
        .collect()
    ]
    assert row["doc_count"] == len(dls)
    assert row["value"] == max(d * 2 + 1 for d in dls)
    s = scripted_metric(spark, src_index, q, map_script="doclen",
                        combine="sum", mode="or").collect()[0]
    assert s["value"] == sum(dls)
    c = scripted_metric(spark, src_index, q, map_script="doclen",
                        combine="count", mode="or").collect()[0]
    assert c["value"] == len(dls)
    with pytest.raises(ValueError, match="combine"):
        scripted_metric(spark, src_index, q, map_script="doclen",
                        combine="median")
    with pytest.raises(ValueError, match="not on the docmap"):
        scripted_metric(spark, src_index, q, map_script="nope",
                        fields=["nope"])


def test_terms_lookup_scalar_and_text(spark, src_index, pages_df):
    some = pages_df.limit(1).collect()[0]
    from sparkfts.tokens import sha1_doc_id
    import pandas as pd

    doc_id = int(sha1_doc_id(pd.Series([some["url"]])).iloc[0])
    # scalar path: the lookup doc's docvalue
    vals = terms_lookup_values(spark, src_index, doc_id, "tag")
    assert len(vals) == 1
    expr = terms_lookup_expr("tag", vals)
    assert expr.startswith("tag IN (")
    # text path: the analyzed distinct token list of the stored _source
    toks = terms_lookup_values(spark, src_index, doc_id, "text")
    from sparkfts.analysis import tokenize

    assert toks == sorted(set(tokenize(some["text"])))
    # the expr actually filters a query to same-tag docs
    from sparkfts.query import bm25_index_batch

    q = some["text"].split()[0].lower()
    res = bm25_index_batch(
        spark, src_index, [(0, q, 1000)], mode="or", filter_expr=expr
    ).collect()
    assert res
    from sparkfts.index import load_docmap

    allowed = {
        r["doc_id"]
        for r in load_docmap(spark, src_index)
        .where(F.col("tag").isin([str(v) for v in vals]))
        .collect()
    }
    assert {r["doc_id"] for r in res} <= allowed
    # guards
    with pytest.raises(ValueError, match="not found"):
        terms_lookup_values(spark, src_index, 12345, "tag")
    with pytest.raises(ValueError, match="path"):
        terms_lookup_values(spark, src_index, doc_id, "nope")
    with pytest.raises(ValueError, match="max_terms"):
        terms_lookup_values(spark, src_index, doc_id, "text", max_terms=2)
    assert terms_lookup_expr("f", []) == "1 = 0"
    assert terms_lookup_expr("f", ["o'neil"]) == "f IN ('o\\'neil')"
    assert terms_lookup_expr("f", [3, 4]) == "f IN (3, 4)"
