"""Edge cases for the round-2 query surfaces (empty/missing/overflow)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    from sparkfts.index import build_index
    from sparkfts.phrase import build_positions
    from sparkfts.synth import gen_corpus

    d = str(tmp_path_factory.mktemp("edge_idx"))
    pages = spark.createDataFrame(gen_corpus(80, seed=3).to_pandas())
    build_index(pages, d, n_shards=2, n_tbuckets=4)
    build_positions(pages, d)
    return d


def test_phrase_unknown_term_empty(spark, small_index):
    from sparkfts.phrase import match_phrase_batch

    got = match_phrase_batch(
        spark, small_index, [(0, "zzzzunknownterm qqqalso", 5)]
    ).collect()
    assert got == []


def test_phrase_empty_query_empty(spark, small_index):
    from sparkfts.phrase import match_phrase_batch

    assert match_phrase_batch(spark, small_index, [(0, "", 5)]).collect() == []


def test_facet_no_matches_empty(spark, small_index):
    from sparkfts.aggs import terms_facet

    dv = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    got = terms_facet(
        spark, small_index, "zzzzunknownterm", dv, "lang"
    ).collect()
    assert got == []


def test_search_after_past_end_empty(spark, small_index):
    from sparkfts.query import bm25_index_batch

    full = bm25_index_batch(spark, small_index, [(0, "the", 400)]).collect()
    assert full
    last = full[-1]
    nxt = bm25_index_batch(
        spark,
        small_index,
        [(0, "the", 10)],
        search_after={0: (last["score"], last["doc_id"])},
    ).collect()
    assert nxt == []


def test_min_should_match_above_term_count_empty(spark, small_index):
    from sparkfts.query import bm25_index_batch

    got = bm25_index_batch(
        spark, small_index, [(0, "the a", 5)], mode="or", min_should_match=9
    ).collect()
    assert got == []


def test_multifield_unknown_field_raises(spark, tmp_path):
    from sparkfts.multifield import (
        bm25_multifield_batch,
        build_multifield_index,
    )
    from sparkfts.synth import gen_corpus

    d = str(tmp_path / "mf_edge")
    pages = spark.createDataFrame(gen_corpus(40, seed=4).to_pandas())
    pages = pages.withColumn("title", F.substring("text", 1, 20))
    build_multifield_index(
        pages, d, fields=("title", "text"), n_shards=2, n_tbuckets=4
    )
    with pytest.raises(ValueError, match="not in index"):
        bm25_multifield_batch(spark, d, [(0, "x", 5)], fields=["body"])


def test_highlight_empty_query_all_null(spark):
    from sparkfts.highlight import highlight

    docs = spark.createDataFrame([(1, "some text")], "doc_id long, text string")
    r = highlight(docs, "").collect()[0]
    assert r["first_tok_pos"] is None and r["fragment"] is None


def test_decontaminate_empty_eval_keeps_all(spark):
    from sparkfts.ops.decontam import decontaminate

    train = spark.createDataFrame(
        [(i, f"doc number {i} with words") for i in range(10)],
        "doc_id long, text string",
    )
    empty_eval = train.where(F.lit(False))
    assert decontaminate(train, empty_eval).count() == 10
