"""Phrase suggester: Stupid-Backoff bigram LM re-ranking of corrected
phrases, vs an independent python mirror."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from sparkfts.analysis import auto_fuzz, tokenize


@pytest.fixture(scope="module")
def ps_index(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index
    from sparkfts.phrasesuggest import build_bigram_model

    d = str(tmp_path_factory.mktemp("ps_idx"))
    pages = spark.createDataFrame(corpus.to_pandas())
    build_index(pages, d, n_shards=4, n_tbuckets=8)
    build_bigram_model(pages, d)
    return d


@pytest.fixture(scope="module")
def lm(corpus):
    uni: Counter = Counter()
    bi: Counter = Counter()
    for text in corpus.column("text").to_pylist():
        toks = tokenize(text)
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    return uni, bi


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_suggest_phrase(spark, ps_index, corpus, lm):
    from sparkfts.phrasesuggest import suggest_phrase

    uni, bi = lm
    total = sum(uni.values())
    # document frequency for the term-suggester candidate order
    dfc: Counter = Counter()
    for text in corpus.column("text").to_pylist():
        dfc.update(set(tokenize(text)))

    # misspell the two most common LONG terms (auto_fuzz >= 1) by one
    # edit each
    terms = [t for t, _ in uni.most_common() if len(t) >= 5][:2]
    bad = [t[:-1] + ("x" if t[-1] != "x" else "y") for t in terms]
    text = " ".join(bad)

    # mirror: per-slot candidates
    from itertools import product

    slots = []
    for t in bad:
        cands = [t] if dfc.get(t, 0) > 0 else []
        pool = [
            (c, _levenshtein(c, t), dfc[c])
            for c in dfc
            if c != t and _levenshtein(c, t) <= auto_fuzz(t)
        ]
        pool.sort(key=lambda x: (x[1], -x[2], x[0]))
        cands += [c for c, _, _ in pool[:3] if c not in cands]
        slots.append(cands)
    assert all(slots), "no candidates generated"

    def score(p):
        s = math.log(uni[p[0]] / total)
        for a, b in zip(p, p[1:]):
            n = bi.get((a, b), 0)
            if n > 0:
                s += math.log(n / uni[a])
            else:
                s += math.log(0.4 * uni[b] / total)
        return s

    exp = sorted(
        ((" ".join(p), score(list(p)))
         for p in product(*slots) if list(p) != bad),
        key=lambda x: (-x[1], x[0]),
    )[:3]
    got = suggest_phrase(
        spark, ps_index, text, size=3, max_candidates=3
    ).collect()
    assert [r["phrase"] for r in got] == [p for p, _ in exp]
    for r, (_, es) in zip(got, exp):
        assert math.isclose(r["score_ln"], es, rel_tol=1e-9)
    assert [r["rank"] for r in got] == [1, 2, 3][: len(got)]
    # the fully-corrected phrase is among the returned candidates
    assert " ".join(terms) in {r["phrase"] for r in got}


def test_suggest_phrase_no_candidates(spark, ps_index):
    from sparkfts.phrasesuggest import suggest_phrase

    out = suggest_phrase(spark, ps_index, "zzzzqqqq xxxxyyyy", size=3)
    assert out.count() == 0
