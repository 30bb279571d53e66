"""span_near (unordered) and span_first vs independent python
recomputation of the pinned specs."""

from __future__ import annotations

import math

import pytest

from sparkfts.analysis import tokenize
from sparkfts.tokens import sha1_doc_id


@pytest.fixture(scope="module")
def span_index(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index
    from sparkfts.phrase import build_positions

    d = str(tmp_path_factory.mktemp("span_idx"))
    pages = spark.createDataFrame(corpus.to_pandas())
    build_index(pages, d, n_shards=4, n_tbuckets=8)
    build_positions(pages, d)
    return d


@pytest.fixture(scope="module")
def positions(corpus):
    """doc_id -> {term: [positions]}, plus doclen."""
    import pandas as pd

    ids = sha1_doc_id(
        pd.Series(corpus.column("url").to_pylist())
    ).tolist()
    out = {}
    for i, text in zip(ids, corpus.column("text").to_pylist()):
        toks = tokenize(text)
        pos: dict[str, list[int]] = {}
        for p, t in enumerate(toks):
            pos.setdefault(t, []).append(p)
        out[int(i)] = (pos, len(toks))
    return out


def _idf(positions, term):
    n = len(positions)
    df = sum(1 for pos, _ in positions.values() if term in pos)
    return math.log(1 + (n - df + 0.5) / (df + 0.5))


def _expected_unordered(positions, terms, slop, k):
    """Independent (loop-based) mirror of the pinned window-anchor
    spec."""
    n_docs = len(positions)
    avgdl = sum(dl for _, dl in positions.values()) / n_docs
    isum = sum(_idf(positions, t) for t in terms)
    span = slop + len(terms) - 1
    scored = []
    for doc, (pos, dl) in positions.items():
        if any(t not in pos for t in terms):
            continue
        anchors = sorted({p for t in terms for p in pos[t]})
        tfp = 0
        for a in anchors:
            if all(
                any(a <= p <= a + span for p in pos[t]) for t in terms
            ):
                tfp += 1
        if tfp == 0:
            continue
        norm = 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
        scored.append((doc, isum * (tfp / (tfp + norm)) * 2.2))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def _pick_terms(positions, want=2):
    from collections import Counter

    c: Counter = Counter()
    for pos, _ in positions.values():
        c.update(pos.keys())
    return [t for t, _ in c.most_common(want)]


def test_span_near_unordered(spark, span_index, positions):
    from sparkfts.spans import span_near_batch

    t = _pick_terms(positions, 2)
    q = " ".join(t)
    for slop in (0, 2, 5):
        exp = _expected_unordered(positions, t, slop, 10)
        got = span_near_batch(
            spark, span_index, [(0, q, 10)], slop=slop, in_order=False
        ).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in exp], slop
        for r, (_, es) in zip(got, exp):
            assert math.isclose(r["score"], es, rel_tol=1e-9), slop


def test_span_near_unordered_catches_reversed_order(spark, span_index,
                                                    positions):
    """Unordered must match docs where the terms appear reversed."""
    from sparkfts.spans import span_near_batch

    t = _pick_terms(positions, 2)
    rev_docs = {
        d
        for d, (pos, _) in positions.items()
        if t[0] in pos and t[1] in pos
        and any(
            any(0 < a - b <= 3 for b in pos[t[1]]) for a in pos[t[0]]
        )
    }
    assert rev_docs, "fixture lacks reversed-order pairs"
    got = span_near_batch(
        spark, span_index, [(0, " ".join(t), len(positions))],
        slop=2, in_order=False,
    ).collect()
    got_ids = {r["doc_id"] for r in got}
    exp = _expected_unordered(positions, t, 2, len(positions))
    assert got_ids == {d for d, _ in exp}


def test_span_near_in_order_is_match_phrase(spark, span_index, positions):
    from sparkfts.phrase import match_phrase_batch
    from sparkfts.spans import span_near_batch

    t = _pick_terms(positions, 2)
    q = " ".join(t)
    a = span_near_batch(
        spark, span_index, [(0, q, 10)], slop=2, in_order=True
    ).collect()
    b = match_phrase_batch(
        spark, span_index, [(0, q, 10)], slop=2
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_span_first(spark, span_index, positions):
    from sparkfts.spans import span_first_batch

    term = _pick_terms(positions, 1)[0]
    end = 5
    n_docs = len(positions)
    avgdl = sum(dl for _, dl in positions.values()) / n_docs
    idf = _idf(positions, term)
    scored = []
    for doc, (pos, dl) in positions.items():
        tfp = sum(1 for p in pos.get(term, []) if p < end)
        if tfp == 0:
            continue
        norm = 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
        scored.append((doc, idf * (tfp / (tfp + norm)) * 2.2))
    scored.sort(key=lambda x: (-x[1], x[0]))
    exp = scored[:10]
    got = span_first_batch(
        spark, span_index, [(0, term, end, 10)]
    ).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, es) in zip(got, exp):
        assert math.isclose(r["score"], es, rel_tol=1e-9)


# ---------------------------------------------------------------------------
# r5: span_or / span_not / span_containing vs loop-based mirrors
# ---------------------------------------------------------------------------


def _score(isum, tfp, dl, avgdl):
    norm = 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
    return isum * (tfp / (tfp + norm)) * 2.2


def _stats(positions):
    n = len(positions)
    return n, sum(dl for _, dl in positions.values()) / n


def test_span_or(spark, span_index, positions):
    from sparkfts.spans import span_or_batch

    terms = sorted(set(_pick_terms(positions, 3)))
    _, avgdl = _stats(positions)
    isum = sum(_idf(positions, t) for t in terms)
    exp = []
    for doc, (pos, dl) in positions.items():
        tfp = len({p for t in terms if t in pos for p in pos[t]})
        if tfp:
            exp.append((doc, _score(isum, tfp, dl, avgdl)))
    exp.sort(key=lambda x: (-x[1], x[0]))
    got = span_or_batch(
        spark, span_index, [(0, " ".join(terms), 10)]
    ).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in exp[:10]]
    for r, (_, es) in zip(got, exp):
        assert math.isclose(r["score"], es, rel_tol=1e-9)


def test_span_not(spark, span_index, positions):
    from sparkfts.spans import span_not_batch

    inc, exc = _pick_terms(positions, 2)
    _, avgdl = _stats(positions)
    idf = _idf(positions, inc)
    for pre, post in ((0, 0), (1, 2)):
        exp = []
        for doc, (pos, dl) in positions.items():
            if inc not in pos:
                continue
            ep = pos.get(exc, [])
            tfp = sum(
                1 for p in pos[inc]
                if not any(p - pre <= e <= p + post for e in ep)
            )
            if tfp:
                exp.append((doc, _score(idf, tfp, dl, avgdl)))
        exp.sort(key=lambda x: (-x[1], x[0]))
        got = span_not_batch(
            spark, span_index, [(0, inc, exc, 10)], pre=pre, post=post
        ).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in exp[:10]], (
            pre, post,
        )
        for r, (_, es) in zip(got, exp):
            assert math.isclose(r["score"], es, rel_tol=1e-9)
    # some doc must actually lose occurrences to the exclusion
    full = {d: (pos, dl) for d, (pos, dl) in positions.items()
            if inc in pos and exc in pos}
    assert full, "fixture premise: overlap docs exist"


def test_span_containing(spark, span_index, positions):
    from sparkfts.spans import span_containing_batch

    t = _pick_terms(positions, 3)
    big, little = t[:2], t[2]
    _, avgdl = _stats(positions)
    isum = sum(_idf(positions, x) for x in big) + _idf(positions, little)
    slop = 3
    span = slop + len(big) - 1
    exp = []
    for doc, (pos, dl) in positions.items():
        if any(x not in pos for x in (*big, little)):
            continue
        anchors = sorted({p for x in big for p in pos[x]})
        tfp = sum(
            1 for a in anchors
            if all(any(a <= p <= a + span for p in pos[x])
                   for x in (*big, little))
        )
        if tfp:
            exp.append((doc, _score(isum, tfp, dl, avgdl)))
    exp.sort(key=lambda x: (-x[1], x[0]))
    got = span_containing_batch(
        spark, span_index, [(0, " ".join(big), little, 10)], slop=slop
    ).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in exp[:10]]
    for r, (_, es) in zip(got, exp):
        assert math.isclose(r["score"], es, rel_tol=1e-9)


def test_span_new_guards(spark, span_index):
    from sparkfts.spans import span_containing_batch, span_not_batch

    with pytest.raises(ValueError, match="single-term"):
        span_not_batch(spark, span_index, [(0, "two words", "x", 5)])
    with pytest.raises(ValueError, match="ONE little"):
        span_containing_batch(spark, span_index, [(0, "a b", "c d", 5)])


def test_span_within(spark, span_index, positions):
    from sparkfts.spans import span_within_batch

    t = _pick_terms(positions, 3)
    big, little = t[:2], t[2]
    _, avgdl = _stats(positions)
    idf = _idf(positions, little)
    slop = 3
    span = slop + len(big) - 1
    exp = []
    for doc, (pos, dl) in positions.items():
        if any(x not in pos for x in (*big, little)):
            continue
        anchors = sorted(
            a for a in {p for x in big for p in pos[x]}
            if all(any(a <= p <= a + span for p in pos[x]) for x in big)
        )
        tfp = sum(
            1 for p in pos[little]
            if any(a <= p <= a + span for a in anchors)
        )
        if tfp:
            exp.append((doc, _score(idf, tfp, dl, avgdl)))
    exp.sort(key=lambda x: (-x[1], x[0]))
    got = span_within_batch(
        spark, span_index, [(0, " ".join(big), little, 10)], slop=slop
    ).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in exp[:10]]
    for r, (_, es) in zip(got, exp):
        assert math.isclose(r["score"], es, rel_tol=1e-9)


def test_span_multi_prefix_equals_span_or_of_expansions(
    spark, span_index, positions
):
    """span_multi(prefix) == span_or over the dictionary expansions
    (the pinned Lucene span rewrite), checked end-to-end on two
    prefixes and one wildcard."""
    from sparkfts.spans import span_multi_batch, span_or_batch

    all_terms = sorted({t for pos, _ in positions.values() for t in pos})
    for prefix in ("s", "th"):
        exps = [t for t in all_terms if t.startswith(prefix)]
        assert exps, "fixture too sparse"
        got = span_multi_batch(
            spark, span_index, [(0, prefix, 10)], kind="prefix"
        ).collect()
        want = span_or_batch(
            spark, span_index, [(0, " ".join(exps), 10)]
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in want
        ]
    # wildcard kind routes through expand_wildcard
    exps = [t for t in all_terms if t.startswith("s") and t.endswith("e")]
    if exps:
        got = span_multi_batch(
            spark, span_index, [(0, "s*e", 10)], kind="wildcard"
        ).collect()
        want = span_or_batch(
            spark, span_index, [(0, " ".join(exps), 10)]
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in want
        ]
    with pytest.raises(ValueError, match="kind"):
        span_multi_batch(spark, span_index, [(0, "s", 5)], kind="fuzzy")


def test_span_multi_max_expansions(spark, span_index, positions):
    """max_expansions caps the rewrite at the N lexicographically
    first dictionary terms (the expand_prefix contract)."""
    from sparkfts.spans import span_multi_batch, span_or_batch

    all_terms = sorted({t for pos, _ in positions.values() for t in pos})
    exps = [t for t in all_terms if t.startswith("s")][:2]
    assert len(exps) == 2
    got = span_multi_batch(
        spark, span_index, [(0, "s", 10)], kind="prefix",
        max_expansions=2,
    ).collect()
    want = span_or_batch(
        spark, span_index, [(0, " ".join(exps), 10)]
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
