"""Index-time stopword analysis option (OFF by default).

Pinned semantics (sparkfts.analysis.tokenize): removed tokens don't
count toward doclen/avgdl; positions are dense over the surviving
stream; the list lives in the index meta and every query path re-applies
it, so build -> query round-trips rank-identically vs a BM25Oracle
constructed with the same list.
"""

from __future__ import annotations

from collections import Counter

import pytest

from oracle.bm25 import BM25Oracle
from sparkfts.analysis import tokenize


@pytest.fixture(scope="module")
def sw_setup(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index, read_meta
    from sparkfts.tokens import sha1_doc_id

    pdf = corpus.to_pandas()
    df_counts = Counter(
        t for text in pdf["text"] for t in set(tokenize(text))
    )
    stop = [t for t, _ in df_counts.most_common(3)]  # head terms
    d = str(tmp_path_factory.mktemp("sw_idx"))
    build_index(
        spark.createDataFrame(pdf), d, n_shards=4, n_tbuckets=8,
        stopwords=stop,
    )
    assert read_meta(d)["stopwords"] == sorted(stop)
    ids = sha1_doc_id(pdf["url"])
    oracle = BM25Oracle(
        zip(ids.tolist(), pdf["text"].tolist()), stopwords=stop
    )
    return d, oracle, stop, pdf


def test_stopword_index_round_trips_vs_oracle(spark, sw_setup, queries):
    """Stopworded build -> query == BM25Oracle with the same list, for
    queries with and without stopword terms, AND and OR."""
    from sparkfts.query import bm25_index_batch

    d, oracle, stop, pdf = sw_setup
    toks = tokenize(pdf.iloc[0]["text"])
    content = [t for t in toks if t not in stop][:2]
    assert len(content) == 2, "test premise"
    qs = [
        " ".join(content),                     # no stopwords
        f"{stop[0]} {content[0]}",             # mixed: stopword dropped
        f"{stop[0]} {stop[1]}",                # all stopwords -> empty
    ]
    for mode in ("and", "or"):
        res = bm25_index_batch(
            spark, d, [(i, q, 15) for i, q in enumerate(qs)], mode=mode
        ).collect()
        by_qid: dict[int, list] = {}
        for r in res:
            by_qid.setdefault(r["query_id"], []).append(r)
        for i, q in enumerate(qs):
            exp = oracle.search(q, k=15, mode=mode)
            rows = sorted(by_qid.get(i, []), key=lambda r: r["rank"])
            assert [r["doc_id"] for r in rows] == [dd for dd, _ in exp], (
                f"mode={mode} q={q!r}"
            )
            for r, (_, s) in zip(rows, exp):
                assert r["score"] == pytest.approx(s, rel=1e-9)
        assert not by_qid.get(2, []), "all-stopword query must match nothing"
    # mixed query == its content-only form (stopword truly dropped, not
    # just zero-scored)
    mixed = bm25_index_batch(spark, d, [(0, qs[1], 15)]).collect()
    content_only = bm25_index_batch(
        spark, d, [(0, content[0], 15)]
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in mixed] == [
        (r["doc_id"], r["score"]) for r in content_only
    ]

    # avgdl excludes stopword tokens, matching the oracle's
    from sparkfts.index import read_meta

    assert read_meta(d)["avgdl"] == pytest.approx(oracle.avgdl, rel=1e-12)


def test_stopword_positions_skip_for_phrases(spark, sw_setup):
    """Positions are dense over the surviving stream: a phrase spanning
    a removed stopword matches as adjacent."""
    import pandas as pd

    from sparkfts.index import build_index
    from sparkfts.phrase import build_positions, match_phrase_batch

    docs = pd.DataFrame(
        {
            "url": ["u1", "u2", "u3"],
            "text": [
                "alpha the beta gamma",   # 'the' stopworded -> alpha beta
                "alpha beta delta",
                "beta alpha",
            ],
        }
    )
    import tempfile, os

    d = os.path.join(tempfile.mkdtemp(prefix="sw_pos_"), "idx")
    build_index(
        spark.createDataFrame(docs), d, n_shards=2, n_tbuckets=4,
        stopwords=["the"],
    )
    build_positions(spark.createDataFrame(docs), d)
    got = match_phrase_batch(spark, d, [(0, "alpha beta", 10)]).collect()
    from sparkfts.tokens import sha1_doc_id

    ids = sha1_doc_id(docs["url"])
    assert {r["doc_id"] for r in got} == {ids[0], ids[1]}


def test_aggs_respect_stopwords(spark, sw_setup):
    """match_docs_batch drops stopword query terms (an AND query mixing
    a stopword stays satisfiable)."""
    from sparkfts.aggs import match_docs_batch

    d, oracle, stop, pdf = sw_setup
    toks = tokenize(pdf.iloc[0]["text"])
    content = [t for t in toks if t not in stop][0]
    plain = {r["doc_id"] for r in match_docs_batch(
        spark, d, [(0, content)], "and").collect()}
    mixed = {r["doc_id"] for r in match_docs_batch(
        spark, d, [(0, f"{stop[0]} {content}")], "and").collect()}
    assert plain and plain == mixed
