"""Sequence packing manifest: two-phase distributed cumsum vs a pure
python mirror of the pinned concat-then-chunk spec."""

from __future__ import annotations

import pytest

from sparkfts.analysis import tokenize
from sparkfts.ops.packing import pack_manifest
from sparkfts.synth import gen_corpus
from sparkfts.tokens import sha1_doc_id


@pytest.fixture(scope="module")
def pk_docs(spark):
    import pandas as pd

    tbl = gen_corpus(180, seed=41).to_pandas()
    tbl["doc_id"] = sha1_doc_id(tbl["url"])
    return spark.createDataFrame(tbl[["doc_id", "text"]])


def _py_manifest(pdf, capacity):
    rows = sorted(
        (int(d), len(tokenize(t)))
        for d, t in zip(pdf["doc_id"], pdf["text"])
        if len(tokenize(t)) > 0
    )
    out, off = [], 0
    for d, n in rows:
        out.append((d, n, off, off // capacity, (off + n - 1) // capacity))
        off += n
    return out


def test_pack_manifest_matches_mirror(spark, pk_docs):
    pdf = pk_docs.toPandas()
    for cap in (128, 2048):
        exp = _py_manifest(pdf, cap)
        got = pack_manifest(pk_docs, capacity=cap).collect()
        assert [
            (r["doc_id"], r["n_tokens"], r["start_offset"],
             r["first_chunk"], r["last_chunk"])
            for r in got
        ] == exp
    # stream invariants: contiguous offsets, chunk spans consistent
    assert exp[0][2] == 0
    for (d1, n1, o1, *_), (_, _, o2, *_) in zip(exp, exp[1:]):
        assert o2 == o1 + n1


def test_pack_manifest_partitioning_invariant(spark, pk_docs):
    a = pack_manifest(pk_docs.repartition(13), capacity=512,
                      n_ranges=3).collect()
    b = pack_manifest(pk_docs.coalesce(1), capacity=512,
                      n_ranges=7).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_pack_manifest_validation_and_empty(spark, pk_docs):
    with pytest.raises(ValueError):
        pack_manifest(pk_docs, capacity=0)
    empty = pk_docs.where("doc_id < 0")
    assert pack_manifest(empty, capacity=64).collect() == []
