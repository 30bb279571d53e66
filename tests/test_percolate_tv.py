"""Percolator (reverse search) and the _termvectors API."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from sparkfts.analysis import tokenize
from sparkfts.index import build_index
from sparkfts.synth import gen_corpus
from sparkfts.tokens import sha1_doc_id


@pytest.fixture(scope="module")
def pccorpus():
    return gen_corpus(200, seed=314)


@pytest.fixture(scope="module")
def pcdocs(spark, pccorpus):
    pdf = pccorpus.to_pandas()
    pdf["doc_id"] = sha1_doc_id(pdf["url"])
    return spark.createDataFrame(pdf[["doc_id", "text"]])


def _toksets(pccorpus):
    pdf = pccorpus.to_pandas()
    ids = sha1_doc_id(pdf["url"])
    return {
        int(i): set(tokenize(t)) for i, t in zip(ids, pdf["text"])
    }


def test_percolate_modes(spark, pcdocs, pccorpus):
    from sparkfts.percolate import percolate

    toksets = _toksets(pccorpus)
    common = Counter()
    for s in toksets.values():
        common.update(s)
    t1, t2, t3 = [t for t, _ in common.most_common(3)]
    queries = [
        (1, f"{t1} {t2}", "and"),
        (2, f"{t1} {t3}", "or"),
        (3, f"{t1} {t2} {t3}", "msm:2"),
        (4, "zzzznotaterm", "or"),
    ]
    got = percolate(spark, pcdocs, queries).collect()
    got_pairs = {(r["doc_id"], r["query_id"]) for r in got}
    exp_pairs = set()
    for d, s in toksets.items():
        if t1 in s and t2 in s:
            exp_pairs.add((d, 1))
        if t1 in s or t3 in s:
            exp_pairs.add((d, 2))
        if sum(t in s for t in (t1, t2, t3)) >= 2:
            exp_pairs.add((d, 3))
    assert got_pairs == exp_pairs
    assert not any(q == 4 for _, q in got_pairs)


def test_percolate_empty_query_matches_nothing(spark, pcdocs):
    from sparkfts.percolate import percolate

    assert (
        percolate(spark, pcdocs, [(1, "!!!", "and")]).count() == 0
    )


def test_termvectors(spark, pcdocs, pccorpus, tmp_path_factory):
    from sparkfts.termvectors import termvectors

    d = str(tmp_path_factory.mktemp("tv") / "idx")
    pdf = pccorpus.to_pandas()
    pages = spark.createDataFrame(pdf)
    build_index(pages, d, n_shards=2, n_tbuckets=4)

    toks_by_doc = {}
    ids = sha1_doc_id(pdf["url"])
    for i, t in zip(ids, pdf["text"]):
        toks_by_doc[int(i)] = tokenize(t)
    want = sorted(toks_by_doc)[:3]
    rows = termvectors(
        spark, d, pcdocs, want, term_statistics=True
    ).collect()
    # global stats mirrors
    df_of = Counter()
    ttf_of = Counter()
    for toks in toks_by_doc.values():
        df_of.update(set(toks))
        ttf_of.update(toks)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert sorted(by_doc) == want
    for doc in want:
        toks = toks_by_doc[doc]
        tf = Counter(toks)
        assert {r["term"] for r in by_doc[doc]} == set(tf)
        for r in by_doc[doc]:
            assert r["term_freq"] == tf[r["term"]]
            assert r["doclen"] == len(toks)
            assert r["doc_freq"] == df_of[r["term"]]
            assert r["ttf"] == ttf_of[r["term"]]
        # pinned ordering: term asc within doc
        terms = [r["term"] for r in by_doc[doc]]
        assert terms == sorted(terms)
