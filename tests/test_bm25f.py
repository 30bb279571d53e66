"""BM25F (combined-fields weighted scoring) vs the pure-Python oracle."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from oracle.bm25f import BM25FOracle
from sparkfts.analysis import tokenize
from sparkfts.synth import gen_corpus
from sparkfts.tokens import sha1_doc_id


@pytest.fixture(scope="module")
def mf_pages(spark):
    """Corpus with a synthetic title field (first 5 tokens, reversed so
    title is NOT a prefix-subset of text — df_any differs from df_text)."""
    pdf = gen_corpus(180, seed=43).to_pandas()
    pdf["title"] = [
        " ".join(reversed(tokenize(t)[:5])) for t in pdf["text"]
    ]
    # make some titles introduce terms absent from the doc's own text:
    # swap titles between adjacent docs
    sw = pdf["title"].tolist()
    sw[::2], sw[1::2] = sw[1::2], sw[::2]
    pdf["title"] = sw
    return pdf


@pytest.fixture(scope="module")
def bm25f_idx(spark, mf_pages, tmp_path_factory):
    from sparkfts.multifield import build_multifield_index

    d = str(tmp_path_factory.mktemp("bm25f") / "idx")
    build_multifield_index(
        spark.createDataFrame(mf_pages),
        d,
        fields=("title", "text"),
        n_shards=4,
        n_tbuckets=8,
    )
    return d


@pytest.fixture(scope="module")
def bm25f_oracle(mf_pages):
    ids = sha1_doc_id(mf_pages["url"]).tolist()
    return BM25FOracle(
        (
            (i, {"title": ti, "text": tx})
            for i, ti, tx in zip(ids, mf_pages["title"], mf_pages["text"])
        ),
        fields=[("title", 2.0), ("text", 1.0)],
    )


def _queries(mf_pages, n=8):
    out = []
    for i, t in enumerate(mf_pages["text"][: n * 2]):
        toks = tokenize(t)
        if len(toks) >= 6:
            out.append(" ".join([toks[0], toks[5]]))
        if len(out) == n:
            break
    return out


def test_bm25f_rank_identical_to_oracle(spark, bm25f_idx, bm25f_oracle, mf_pages):
    from sparkfts.multifield import bm25f_batch

    qs = _queries(mf_pages)
    for mode in ("and", "or"):
        batch = [(i, q, 10) for i, q in enumerate(qs)]
        got = bm25f_batch(
            spark, bm25f_idx, batch, fields=["title^2", "text"], mode=mode
        )
        by_qid: dict[int, list] = {}
        for r in got.collect():
            by_qid.setdefault(r["query_id"], []).append(r)
        nonempty = 0
        for qid, q, k in batch:
            exp = bm25f_oracle.search(q, k=k, mode=mode)
            rows = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
            assert [r["doc_id"] for r in rows] == [d for d, _ in exp], (
                mode,
                q,
            )
            for r, (_, s) in zip(rows, exp):
                assert r["score"] == pytest.approx(s, rel=1e-9)
            nonempty += bool(exp)
        assert nonempty >= 6, mode


def test_bm25f_differs_from_best_fields(spark, bm25f_idx, mf_pages):
    """Sanity: combined-fields is a genuinely different combiner than
    best-fields max (same index, same query, different scores)."""
    from sparkfts.multifield import bm25_multifield_batch, bm25f_batch

    qs = _queries(mf_pages)
    diffs = 0
    for q in qs:
        a = bm25f_batch(
            spark, bm25f_idx, [(0, q, 5)], fields=["title^2", "text"],
            mode="or",
        ).collect()
        b = bm25_multifield_batch(
            spark, bm25f_idx, [(0, q, 5)], fields=["title^2", "text"],
            mode="or",
        ).collect()
        if [(r["doc_id"], r["score"]) for r in a] != [
            (r["doc_id"], r["score"]) for r in b
        ]:
            diffs += 1
    assert diffs > 0


def test_terms_any_df(spark, bm25f_idx, bm25f_oracle):
    """The combined dictionary's df_any matches the oracle's
    any-field document frequencies."""
    from sparkfts.multifield import load_terms_any

    rows = {
        r["term"]: r["df_any"]
        for r in load_terms_any(spark, bm25f_idx).collect()
    }
    for t, docs in list(bm25f_oracle.docs_with.items())[:200]:
        assert rows.get(t, 0) == len(docs), t


def test_bm25f_single_field_reduces_to_bm25(spark, mf_pages, tmp_path):
    """BM25F over ONE field with weight 1 == plain BM25 on that field."""
    from sparkfts.multifield import bm25f_batch, build_multifield_index
    from sparkfts.query import bm25_index_batch
    from sparkfts.multifield import field_dir

    d = str(tmp_path / "one_field")
    build_multifield_index(
        spark.createDataFrame(mf_pages), d, fields=("text",),
        n_shards=4, n_tbuckets=8,
    )
    qs = _queries(mf_pages)[:3]
    for q in qs:
        a = bm25f_batch(spark, d, [(0, q, 10)], fields=["text"],
                        mode="or").collect()
        b = bm25_index_batch(
            spark, field_dir(d, "text"), [(0, q, 10)], mode="or"
        ).collect()
        # same ranking; scores differ only by the k1*(1-b+b*dl/avgdl)
        # vs (k1 + tf~) denominator forms being algebraically equal:
        # tf/(tf+k1*X) == (tf/X)/(tf/X + k1)
        assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b], q
        for ra, rb in zip(a, b):
            assert ra["score"] == pytest.approx(rb["score"], rel=1e-9)
