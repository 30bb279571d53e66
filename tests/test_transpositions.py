"""ES ``fuzzy_transpositions`` (Damerau-Levenshtein) fuzzy matching.

ES/Lucene count a transposition as one edit by default; the engine's
pinned default stays plain Levenshtein (the original oracle contract),
with ``transpositions=True`` opting into the ES behavior. The pinned
distance is the UNRESTRICTED Damerau variant — identical to DuckDB's
``damerau_levenshtein`` so driver oracles stay SQL-expressible.
"""

from __future__ import annotations

import duckdb
import pytest

from oracle.bm25 import BM25Oracle
from oracle.fuzzy import damerau_levenshtein, fuzzy_search, levenshtein
from sparkfts.index import build_index
from sparkfts.synth import gen_corpus
from sparkfts.tokens import sha1_doc_id


@pytest.fixture(scope="module")
def tcorpus():
    return gen_corpus(250, seed=31)


@pytest.fixture(scope="module")
def tidx(spark, tcorpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("transp") / "idx")
    build_index(
        spark.createDataFrame(tcorpus.to_pandas()), d, n_shards=4,
        n_tbuckets=8,
    )
    return d


@pytest.fixture(scope="module")
def toracle(tcorpus):
    pdf = tcorpus.to_pandas()
    ids = sha1_doc_id(pdf["url"])
    return BM25Oracle(zip(ids.tolist(), pdf["text"].tolist()))


def _transposed_query(toracle) -> str:
    """A two-term query of transposed typos of common terms, each
    reachable ONLY with transpositions at its AUTO distance."""
    from sparkfts.analysis import auto_fuzz

    dictionary = list(toracle.postings.keys())
    picks = []
    for t in sorted(dictionary, key=lambda t: -len(toracle.postings[t])):
        if len(t) < 4 or len(t) > 5:
            continue  # AUTO distance 1 band
        typo = t[:1] + t[2] + t[1] + t[3:]  # swap chars 2/3
        if typo == t or typo in dictionary:
            continue
        assert damerau_levenshtein(typo, t) == 1
        if levenshtein(typo, t) <= auto_fuzz(typo):
            continue  # must NOT be reachable without transpositions
        picks.append(typo)
        if len(picks) == 2:
            break
    assert len(picks) == 2, "fixture corpus lacks transposable terms"
    return " ".join(picks)


def test_damerau_matches_duckdb(toracle):
    con = duckdb.connect()
    dictionary = sorted(toracle.postings.keys())[:300]
    for q in ["teh", "sprak", "jion", "abcd"]:
        for t in dictionary[:120]:
            ref = con.execute(
                "select damerau_levenshtein(?, ?)", [q, t]
            ).fetchone()[0]
            assert damerau_levenshtein(q, t) == ref
    # the lev <= 2*dam prefilter bound used by the JVM join
    for q in ["teh", "sprak", "jion"]:
        for t in dictionary[:120]:
            assert levenshtein(q, t) <= 2 * damerau_levenshtein(q, t) or (
                q == t
            )


def test_index_fuzzy_transpositions(spark, tidx, toracle):
    from sparkfts.query import bm25_index_fuzzy_batch

    q = _transposed_query(toracle)
    exp = fuzzy_search(toracle, q, k=10, mode="and", transpositions=True)
    got = bm25_index_fuzzy_batch(
        spark, tidx, [(0, q, 10)], mode="and", transpositions=True
    ).collect()
    assert exp, "transposed query matched nothing — fixture broken"
    assert [(r["doc_id"]) for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-9)
    # without transpositions the same query must match nothing
    plain = bm25_index_fuzzy_batch(
        spark, tidx, [(0, q, 10)], mode="and"
    ).collect()
    assert plain == []


def test_scan_fuzzy_transpositions(spark, tcorpus, toracle):
    from sparkfts.fuzzy import bm25_fuzzy_scan_batch
    from sparkfts.stats import avgdl_of
    from sparkfts.tokens import prepare_pages, tokenize_docs

    pages = spark.createDataFrame(tcorpus.to_pandas())
    tokens = tokenize_docs(prepare_pages(pages))
    n_docs = toracle.n_docs
    q = _transposed_query(toracle)
    exp = fuzzy_search(toracle, q, k=10, mode="or", transpositions=True)
    got = bm25_fuzzy_scan_batch(
        tokens, [(0, q, 10)], n_docs, avgdl_of(tokens, n_docs),
        mode="or", transpositions=True,
    ).collect()
    assert [(r["doc_id"]) for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_searcher_fuzzy_transpositions(spark, tidx, toracle):
    from sparkfts.searcher import Searcher

    s = Searcher(spark, tidx)
    q = _transposed_query(toracle)
    exp = fuzzy_search(toracle, q, k=10, mode="and", transpositions=True)
    got = s.fuzzy_search_rows([(0, q, 10)], mode="and", transpositions=True)
    assert [(r[2]) for r in got] == [d for d, _ in exp]
    for r, (_, sc) in zip(got, exp):
        assert r[3] == pytest.approx(sc, rel=1e-9)


def test_default_unchanged(spark, tidx, toracle):
    """transpositions=False (default) is byte-identical to the old path
    on a plain-Levenshtein-reachable typo."""
    from sparkfts.query import bm25_index_fuzzy_batch

    term = max(toracle.postings, key=lambda t: len(toracle.postings[t]))
    typo = term[:-1] + ("x" if term[-1] != "x" else "y")
    old = bm25_index_fuzzy_batch(spark, tidx, [(0, typo, 10)]).collect()
    new = bm25_index_fuzzy_batch(
        spark, tidx, [(0, typo, 10)], transpositions=False
    ).collect()
    assert [tuple(r) for r in old] == [tuple(r) for r in new]
    assert old, "fixture typo matched nothing"
