"""match_bool_prefix (search-as-you-type, non-positional) vs a python
mirror of the pinned grouped scoring."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from sparkfts.analysis import tokenize
from sparkfts.tokens import sha1_doc_id


@pytest.fixture(scope="module")
def bp_index(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index

    d = str(tmp_path_factory.mktemp("bp_idx"))
    build_index(
        spark.createDataFrame(corpus.to_pandas()), d,
        n_shards=4, n_tbuckets=8,
    )
    return d


@pytest.fixture(scope="module")
def toks_by_doc(corpus):
    import pandas as pd

    ids = sha1_doc_id(pd.Series(corpus.column("url").to_pylist()))
    return {
        int(i): tokenize(t)
        for i, t in zip(ids.tolist(), corpus.column("text").to_pylist())
    }


def _mirror(toks_by_doc, fixed, prefix, mode, k):
    n_docs = len(toks_by_doc)
    avgdl = sum(len(t) for t in toks_by_doc.values()) / n_docs
    dfc: Counter = Counter()
    for toks in toks_by_doc.values():
        dfc.update(set(toks))
    vocab = sorted(dfc)
    exps = [t for t in vocab if t.startswith(prefix)]

    def idf(t):
        return math.log(1 + (n_docs - dfc[t] + 0.5) / (dfc[t] + 0.5))

    scored = []
    for doc, toks in toks_by_doc.items():
        tf = Counter(toks)
        dl = len(toks)
        norm = 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
        contribs = []
        for t in fixed:
            if tf.get(t):
                contribs.append(idf(t) * (tf[t] / (tf[t] + norm)) * 2.2)
            else:
                contribs.append(None)
        best = None
        for e in exps:
            if tf.get(e):
                s = idf(e) * (tf[e] / (tf[e] + norm)) * 2.2
                best = s if best is None else max(best, s)
        contribs.append(best)
        if mode == "and" and any(c is None for c in contribs):
            continue
        present = [c for c in contribs if c is not None]
        if not present:
            continue
        scored.append((doc, sum(present)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def _picks(toks_by_doc):
    c: Counter = Counter()
    for toks in toks_by_doc.values():
        c.update(set(toks))
    fixed = [t for t, _ in c.most_common(2)]
    long_term = next(t for t, _ in c.most_common() if len(t) >= 4)
    return fixed, long_term[:2]


def test_match_bool_prefix_or_and(spark, bp_index, toks_by_doc):
    from sparkfts.prefix import match_bool_prefix_batch

    fixed, prefix = _picks(toks_by_doc)
    q = " ".join(fixed) + " " + prefix
    for mode in ("or", "and"):
        exp = _mirror(toks_by_doc, fixed, prefix, mode, 10)
        assert exp, f"fixture too sparse for mode {mode}"
        got = match_bool_prefix_batch(
            spark, bp_index, [(0, q, 10)], mode=mode
        ).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in exp], mode
        for r, (_, es) in zip(got, exp):
            assert math.isclose(r["score"], es, rel_tol=1e-9), mode


def test_match_bool_prefix_missing_fixed_term_and_mode(spark, bp_index):
    """operator=and with an unindexed fixed term matches nothing."""
    from sparkfts.prefix import match_bool_prefix_batch

    got = match_bool_prefix_batch(
        spark, bp_index, [(0, "zzzznotaterm th", 10)], mode="and"
    ).collect()
    assert got == []


def test_match_bool_prefix_single_prefix_equals_prefix_query(
    spark, bp_index, toks_by_doc
):
    """With only a prefix slot the query degenerates to the prefix
    query (identical pinned scoring)."""
    from sparkfts.prefix import match_bool_prefix_batch, prefix_topk_batch

    _fixed, prefix = _picks(toks_by_doc)
    a = match_bool_prefix_batch(
        spark, bp_index, [(0, prefix, 10)], mode="or"
    ).collect()
    b = prefix_topk_batch(spark, bp_index, [(0, prefix, 10)]).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]