"""Query-time synonym expansion (sparkfts.query.bm25_index_synonym_batch).

Pinned semantics: each analyzed query term's expansion group is
``{term} | analyze(synonyms[term])``; a group matches when ANY member
matches and scores best-member-wins with weight = idf(df(member)) —
the fuzzy-group semantics with boost 1 (documented divergence from
Lucene's blended-df SynonymQuery).

Ground truth: a python oracle over BM25Oracle postings implementing the
same pinned formula.
"""

from __future__ import annotations

import pytest

from oracle.bm25 import BM25Oracle
from sparkfts.analysis import tokenize_query
from sparkfts.index import build_index
from sparkfts.synth import gen_corpus
from sparkfts.tokens import sha1_doc_id


@pytest.fixture(scope="module")
def sy_corpus():
    return gen_corpus(300, seed=91)


@pytest.fixture(scope="module")
def sy_idx(spark, sy_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("syn") / "idx")
    build_index(
        spark.createDataFrame(sy_corpus.to_pandas()), d, n_shards=4,
        n_tbuckets=8,
    )
    return d


@pytest.fixture(scope="module")
def sy_oracle(sy_corpus):
    pdf = sy_corpus.to_pandas()
    ids = sha1_doc_id(pdf["url"])
    return BM25Oracle(zip(ids.tolist(), pdf["text"].tolist()))


def _synonym_search(oracle, query, synonyms, k=10, mode="and"):
    """Pinned-semantics python oracle -> [(doc_id, score)]."""
    import math

    terms = tokenize_query(query)
    groups = []
    for t in terms:  # sorted by tokenize_query
        members = {t}
        for s in synonyms.get(t, ()):
            members.update(tokenize_query(s))
        groups.append(sorted(members))
    k1, b = 1.2, 0.75
    n, avgdl = oracle.n_docs, oracle.avgdl

    def idf(df):
        return math.log(1 + (n - df + 0.5) / (df + 0.5))

    scores = {}
    for doc, dl in oracle.doclen.items():
        total, nm = 0.0, 0
        for members in groups:
            best = None
            for m in members:
                tf = oracle.postings.get(m, {}).get(doc, 0)
                if not tf:
                    continue
                w = idf(len(oracle.postings.get(m, {})))
                tfn = tf / (tf + k1 * (1 - b + b * dl / avgdl))
                c = w * tfn * (k1 + 1.0)
                if best is None or c > best:
                    best = c
            if best is not None:
                total += best
                nm += 1
        if mode == "and" and nm < len(groups):
            continue
        if nm:
            scores[doc] = total
    out = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
    return out[:k]


def _pick_terms(sy_oracle):
    """Two common terms with disjoint posting overlap so the synonym
    widens the match set."""
    by_df = sorted(
        sy_oracle.postings, key=lambda t: -len(sy_oracle.postings[t])
    )
    return by_df[0], by_df[3], by_df[5]


def test_synonym_widens_and_matches_oracle(spark, sy_idx, sy_oracle):
    from sparkfts.query import bm25_index_synonym_batch

    base, syn, other = _pick_terms(sy_oracle)
    q = f"{base} {other}"
    syns = {other: [syn]}
    exp = _synonym_search(sy_oracle, q, syns, k=10)
    got = bm25_index_synonym_batch(
        spark, sy_idx, [(0, q, 10)], synonyms=syns
    ).collect()
    assert exp, "test premise: query matches"
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_empty_synonyms_equals_exact(spark, sy_idx, sy_oracle):
    """No synonyms -> identical to the exact conjunctive path."""
    from sparkfts.query import bm25_index_batch, bm25_index_synonym_batch

    base, _, other = _pick_terms(sy_oracle)
    q = f"{base} {other}"
    plain = bm25_index_batch(spark, sy_idx, [(0, q, 10)]).collect()
    syn = bm25_index_synonym_batch(
        spark, sy_idx, [(0, q, 10)], synonyms={}
    ).collect()
    assert [
        (r["query_id"], r["rank"], r["doc_id"]) for r in plain
    ] == [(r["query_id"], r["rank"], r["doc_id"]) for r in syn]
    for a, b in zip(plain, syn):
        assert a["score"] == pytest.approx(b["score"], rel=1e-12)


def test_unknown_synonym_ignored(spark, sy_idx, sy_oracle):
    """A synonym term absent from the corpus contributes nothing."""
    from sparkfts.query import bm25_index_synonym_batch

    base, _, _ = _pick_terms(sy_oracle)
    a = bm25_index_synonym_batch(
        spark, sy_idx, [(0, base, 10)], synonyms={}
    ).collect()
    b = bm25_index_synonym_batch(
        spark, sy_idx, [(0, base, 10)],
        synonyms={base: ["zzzznotaword"]},
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_or_mode(spark, sy_idx, sy_oracle):
    from sparkfts.query import bm25_index_synonym_batch

    base, syn, other = _pick_terms(sy_oracle)
    q = f"{base} {other}"
    syns = {base: [syn]}
    exp = _synonym_search(sy_oracle, q, syns, k=10, mode="or")
    got = bm25_index_synonym_batch(
        spark, sy_idx, [(0, q, 10)], synonyms=syns, mode="or"
    ).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-9)
