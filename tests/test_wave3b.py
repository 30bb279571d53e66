"""percentile_ranks aggregation, _delete_by_query, _mget."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle.bm25 import BM25Oracle
from sparkfts.index import build_index
from sparkfts.synth import gen_corpus
from sparkfts.tokens import sha1_doc_id


@pytest.fixture(scope="module")
def w3_corpus():
    return gen_corpus(200, seed=61)


@pytest.fixture(scope="module")
def w3_idx(spark, w3_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("w3") / "idx")
    pages = spark.createDataFrame(w3_corpus.to_pandas())
    build_index(pages, d, n_shards=4, n_tbuckets=8, store_source=True)
    return d


@pytest.fixture(scope="module")
def w3_oracle(w3_corpus):
    import pandas as pd

    ids = sha1_doc_id(pd.Series(w3_corpus.column("url").to_pylist()))
    return BM25Oracle(
        zip(ids.tolist(), w3_corpus.column("text").to_pylist())
    )


@pytest.fixture(scope="module")
def w3_nchars(spark, w3_corpus):
    import pandas as pd

    pdf = w3_corpus.to_pandas()
    pdf["doc_id"] = sha1_doc_id(pdf["url"])
    pdf["n_chars"] = pdf["text"].str.len()
    return spark.createDataFrame(pdf[["doc_id", "n_chars"]])


def _matched(w3_oracle, q, mode="or"):
    return {
        d for d, _ in w3_oracle.search(q, k=w3_oracle.n_docs, mode=mode)
    }


def test_percentile_ranks(spark, w3_idx, w3_oracle, w3_nchars, w3_corpus):
    from sparkfts.aggs import percentile_ranks_agg

    q = "the data"
    m = _matched(w3_oracle, q)
    assert len(m) > 20
    vals = {
        r["doc_id"]: r["n_chars"] for r in w3_nchars.collect()
        if r["doc_id"] in m
    }
    xs = sorted(vals.values())
    import statistics

    probes = [float(xs[len(xs) // 4]), float(statistics.median(xs)),
              float(xs[-1]), 0.0]
    got = percentile_ranks_agg(
        spark, w3_idx, q, w3_nchars, "n_chars", probes, mode="or"
    ).collect()
    exp = [
        (v, sum(1 for x in xs if x <= v) * 100_000_000 // len(xs))
        for v in probes
    ]
    assert [(r["value"], r["rank_e6"]) for r in got] == exp
    assert got[-1]["rank_e6"] == 0 and got[2]["rank_e6"] == 100_000_000
    with pytest.raises(ValueError):
        percentile_ranks_agg(spark, w3_idx, q, w3_nchars, "n_chars", [])


def test_delete_by_query(spark, w3_idx, w3_oracle, tmp_path):
    import shutil

    from sparkfts.deletes import delete_by_query
    from sparkfts.query import bm25_index_batch

    idx = str(tmp_path / "dbq")
    shutil.copytree(w3_idx, idx)
    # two highest-df corpus terms: a non-empty AND match set
    q = " ".join(
        sorted(
            w3_oracle.postings,
            key=lambda t: -len(w3_oracle.postings[t]),
        )[:2]
    )
    m = _matched(w3_oracle, q, "and")
    assert m
    n = delete_by_query(spark, idx, q, mode="and")
    assert n == len(m)
    # matched docs are gone from every query path
    assert bm25_index_batch(spark, idx, [(0, q, 10)], mode="and").collect() == []
    left = bm25_index_batch(
        spark, idx, [(0, "the", 10_000)], mode="or"
    ).collect()
    assert left and all(r["doc_id"] not in m for r in left)
    # replay counts zero (already-deleted docs are masked out)
    assert delete_by_query(spark, idx, q, mode="and") == 0


def test_mget(spark, w3_idx, w3_corpus, tmp_path):
    import shutil

    import pandas as pd

    from sparkfts.deletes import delete_docs
    from sparkfts.lifecycle import mget

    pdf = w3_corpus.to_pandas()
    ids = sha1_doc_id(pdf["url"]).tolist()
    texts = dict(zip(ids, pdf["text"]))
    urls = dict(zip(ids, pdf["url"]))

    idx = str(tmp_path / "mget")
    shutil.copytree(w3_idx, idx)
    victim, keep1, keep2 = ids[5], ids[0], ids[17]
    delete_docs(spark, idx, [victim])

    req = [keep2, victim, 999, keep1]  # request order preserved
    got = mget(spark, idx, req, with_source=True).collect()
    assert [r["doc_id"] for r in got] == req
    assert [r["found"] for r in got] == [True, False, False, True]
    assert got[0]["url"] == urls[keep2] and got[3]["url"] == urls[keep1]
    assert got[0]["text"] == texts[keep2]
    assert got[1]["url"] is None and got[1]["text"] is None

    assert mget(spark, idx, []).collect() == []
