"""ES sparse_vector retrieval vs a python dot-product mirror."""

from __future__ import annotations

import os

import pytest

from sparkfts.analysis import tokenize
from sparkfts.sparsevec import (
    sparse_vector_topk,
    tf_sparse_vectors,
    write_sparse_index,
)


@pytest.fixture(scope="module")
def sparse_idx(spark, pages_df, tmp_path_factory):
    from sparkfts.tokens import prepare_pages

    d = str(tmp_path_factory.mktemp("sparse_idx"))
    docs = prepare_pages(pages_df).select("doc_id", "text")
    vecs = tf_sparse_vectors(docs, top_m=16)
    write_sparse_index(vecs, d, n_tbuckets=8)
    return d, docs


def _py_vectors(docs_rows, top_m=16):
    out = {}
    for r in docs_rows:
        tf: dict[str, int] = {}
        for t in tokenize(r["text"]):
            tf[t] = tf.get(t, 0) + 1
        top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:top_m]
        out[r["doc_id"]] = {t: c * 1000 for t, c in top}
    return out


def test_sparse_topk_matches_mirror(spark, sparse_idx):
    d, docs = sparse_idx
    rows = docs.collect()
    vecs = _py_vectors(rows)
    query = {"the": 2.0, "of": 1.0, "a": 0.5}
    got = sparse_vector_topk(spark, d, query, k=10, n_tbuckets=8).collect()
    qw = {t: int(round(w * 1000)) for t, w in query.items()}
    exp = []
    for doc, v in vecs.items():
        dot = sum(v.get(t, 0) * w for t, w in qw.items())
        if dot > 0:
            exp.append((dot, doc))
    exp.sort(key=lambda t: (-t[0], t[1]))
    exp = exp[:10]
    assert [(r["dot"], r["doc_id"]) for r in got] == exp
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


def test_sparse_topk_prunes_buckets(spark, sparse_idx):
    """Only the query terms' tbuckets appear in the scan plan."""
    d, _ = sparse_idx
    from sparkfts.index import term_bucket

    q = {"the": 1.0}
    b = term_bucket("the", 8)
    df = sparse_vector_topk(spark, d, q, k=5, n_tbuckets=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert f"tbucket#" in plan  # partition filter present
    assert "PushedFilters" in plan or "PartitionFilters" in plan
    rows = df.collect()
    assert rows, "common term must match"
    assert b == term_bucket("the", 8)


def test_sparse_validation(spark, sparse_idx, tmp_path):
    d, _ = sparse_idx
    with pytest.raises(ValueError):
        sparse_vector_topk(spark, d, {}, k=5)
    with pytest.raises(ValueError):
        sparse_vector_topk(spark, d, {"x": 1.0}, k=0)
    with pytest.raises(ValueError, match="sparse index"):
        sparse_vector_topk(spark, str(tmp_path), {"x": 1.0}, k=5)
