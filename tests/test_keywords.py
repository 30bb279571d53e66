"""tf-idf keywords + PMI collocations vs python mirrors."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from sparkfts.analysis import tokenize
from sparkfts.ops.keywords import collocations, tfidf_keywords

DOCS = [
    (0, "spark spark spark join the query engine"),
    (1, "the quick brown fox and the quick query"),
    (2, "join the spark query join plan join"),
    (3, "unique singleton content entirely here"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text"])
    )


def _mirror_keywords(k):
    tf = {}
    dfc = {}
    for did, text in DOCS:
        counts = {}
        for t in tokenize(text):
            counts[t] = counts.get(t, 0) + 1
        tf[did] = counts
        for t in counts:
            dfc[t] = dfc.get(t, 0) + 1
    n = len(DOCS)
    out = {}
    for did, counts in tf.items():
        scored = [
            (c * math.log(1 + (n - dfc[t] + 0.5) / (dfc[t] + 0.5)), t, c)
            for t, c in counts.items()
        ]
        scored.sort(key=lambda x: (-x[0], x[1]))
        out[did] = [(t, c, math.floor(s * 1e6 + 0.5))
                    for s, t, c in scored[:k]]
    return out


def test_tfidf_keywords(docs):
    got: dict[int, list] = {}
    for r in tfidf_keywords(docs, k=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["term"], r["tf"], r["score_e6"])
        )
    assert got == _mirror_keywords(3)
    # 'the' (in 3 of 4 docs) must rank below doc-specific terms
    assert got[1][0][0] == "quick"
    with pytest.raises(ValueError):
        tfidf_keywords(docs, k=0)


def test_collocations(docs):
    rows = collocations(docs, min_count=2, size=10).collect()
    # brute mirror
    bg: dict[str, int] = {}
    uni: dict[str, int] = {}
    n_bi = 0
    for _, text in DOCS:
        toks = tokenize(text)
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bg[f"{a} {b}"] = bg.get(f"{a} {b}", 0) + 1
            n_bi += 1
    exp = sorted(
        ((c, b) for b, c in bg.items() if c >= 2),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    assert [(r["count"], r["bigram"]) for r in rows] == exp
    for r in rows:
        w1, w2 = r["bigram"].split(" ")
        pmi = math.log(n_bi * bg[r["bigram"]] / (uni[w1] * uni[w2]))
        assert r["pmi_e6"] == math.floor(pmi * 1e6 + 0.5)
    with pytest.raises(ValueError):
        collocations(docs, min_count=0)
