"""ES custom routing: routing_col shard assignment at build time,
single-shard pruned queries at query time.

Invariant under test: with global scoring stats (the engine's pinned
dfs_query_then_fetch-style contract), a routed query equals the
unrouted query restricted to the docs whose routing value hashes to
the routed shard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkfts.index import build_index, load_docmap, read_meta, routing_shard
from sparkfts.query import bm25_index_batch
from sparkfts.synth import gen_corpus
from sparkfts.tokens import sha1_doc_id

N_SHARDS = 4


@pytest.fixture(scope="module")
def rcorpus():
    return gen_corpus(250, seed=31)


@pytest.fixture(scope="module")
def ridx(spark, rcorpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("routing") / "idx")
    build_index(
        spark.createDataFrame(rcorpus.to_pandas()), d,
        n_shards=N_SHARDS, n_tbuckets=8, routing_col="lang",
        docvalue_cols=["lang"],
    )
    return d


@pytest.fixture(scope="module")
def doc_lang(rcorpus):
    import pandas as pd

    ids = sha1_doc_id(pd.Series(rcorpus.column("url").to_pylist()))
    return dict(zip(ids.tolist(), rcorpus.column("lang").to_pylist()))


def test_meta_and_shard_assignment(spark, ridx, doc_lang):
    assert read_meta(ridx)["routing_col"] == "lang"
    rows = load_docmap(spark, ridx).select("doc_id", "shard").collect()
    assert len(rows) == len(doc_lang)
    for r in rows:
        assert r["shard"] == routing_shard(
            doc_lang[r["doc_id"]], N_SHARDS
        )


def test_routed_query_equals_shard_restriction(spark, ridx, rcorpus,
                                               doc_lang):
    from sparkfts.analysis import tokenize

    q = None
    from collections import Counter

    c: Counter = Counter()
    for t in rcorpus.column("text").to_pylist():
        c.update(set(tokenize(t)))
    q = " ".join(t for t, _ in c.most_common(2))

    full = bm25_index_batch(
        spark, ridx, [(0, q, 10_000)], mode="or"
    ).collect()
    assert len(full) > 50, "fixture too sparse"
    for lang in ("en", "de"):
        sid = routing_shard(lang, N_SHARDS)
        exp = [
            (r["doc_id"], r["score"]) for r in full
            if routing_shard(doc_lang[r["doc_id"]], N_SHARDS) == sid
        ][:10]
        got = bm25_index_batch(
            spark, ridx, [(0, q, 10)], mode="or", routing=lang
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == exp
        assert [r["rank"] for r in got] == list(range(1, len(exp) + 1))


def test_routed_query_with_filter(spark, ridx, rcorpus, doc_lang):
    """routing + bool.filter compose: the docmap allowed-set scan is
    pruned to the routed shard too."""
    from collections import Counter

    from sparkfts.analysis import tokenize

    c: Counter = Counter()
    for t in rcorpus.column("text").to_pylist():
        c.update(set(tokenize(t)))
    q = " ".join(t for t, _ in c.most_common(2))
    sid = routing_shard("en", N_SHARDS)
    full = bm25_index_batch(
        spark, ridx, [(0, q, 10_000)], mode="or"
    ).collect()
    exp = [
        (r["doc_id"], r["score"]) for r in full
        if routing_shard(doc_lang[r["doc_id"]], N_SHARDS) == sid
        and doc_lang[r["doc_id"]] == "en"
    ][:10]
    got = bm25_index_batch(
        spark, ridx, [(0, q, 10)], mode="or", routing="en",
        filter_expr="lang = 'en'",
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == exp


def test_routing_on_unrouted_index_fails_loud(spark, rcorpus,
                                              tmp_path_factory):
    d = str(tmp_path_factory.mktemp("routing") / "plain")
    build_index(
        spark.createDataFrame(rcorpus.to_pandas()[:50]), d,
        n_shards=2, n_tbuckets=4,
    )
    with pytest.raises(ValueError, match="routing_col"):
        bm25_index_batch(spark, d, [(0, "the", 5)], routing="en")


def test_bad_routing_col_fails_loud(spark, rcorpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("routing") / "bad")
    with pytest.raises(ValueError, match="routing_col"):
        build_index(
            spark.createDataFrame(rcorpus.to_pandas()[:20]), d,
            n_shards=2, n_tbuckets=4, routing_col="nope",
        )


def test_streamed_append_inherits_routing(spark, rcorpus, ridx, doc_lang,
                                          tmp_path):
    import shutil

    from sparkfts.streaming import ingest_batch

    idx2 = str(tmp_path / "ridx2")
    shutil.copytree(ridx, idx2)
    extra_pdf = gen_corpus(40, seed=99).to_pandas()
    # synth urls are position-deterministic across seeds: disambiguate
    # so the append is 40 NEW docs, not 40 re-crawls
    extra_pdf["url"] = "https://fresh.example/" + extra_pdf["url"].str[8:]
    ingest_batch(
        spark.createDataFrame(extra_pdf), 1, idx2,
        n_shards=N_SHARDS, n_tbuckets=8,
    )
    import pandas as pd

    ids = sha1_doc_id(extra_pdf["url"])
    extra_lang = dict(zip(ids.tolist(), extra_pdf["lang"]))
    assert read_meta(idx2)["routing_col"] == "lang"
    rows = load_docmap(spark, idx2).select("doc_id", "shard").collect()
    both = {**doc_lang, **extra_lang}
    assert len(rows) == len(both)
    for r in rows:
        assert r["shard"] == routing_shard(both[r["doc_id"]], N_SHARDS)
