"""Hypothesis property tests for the round-2 kernels (pure, no Spark)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from oracle.phrase import PhraseOracle
from sparkfts.wand import _after_mask, _topk, score_disjunctive

TOKENS = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=40
)


@given(doc=TOKENS, phrase=st.lists(
    st.sampled_from(["a", "b", "c"]), min_size=1, max_size=3))
@settings(max_examples=200, deadline=None)
def test_phrase_freq_matches_bruteforce(doc, phrase):
    o = PhraseOracle([(1, " ".join(doc))]) if doc else PhraseOracle(
        [(1, "x")]
    )
    got = o.phrase_freq(phrase, 1)
    n = len(phrase)
    brute = sum(
        1
        for i in range(len(doc) - n + 1)
        if doc[i : i + n] == phrase
    )
    assert got == brute


@st.composite
def scored_docs(draw):
    n = draw(st.integers(1, 30))
    ids = np.array(
        sorted(draw(st.sets(st.integers(0, 10**6), min_size=n, max_size=n))),
        np.int64,
    )
    scores = np.array(
        draw(
            st.lists(
                st.floats(0.01, 100, allow_nan=False),
                min_size=n,
                max_size=n,
            )
        ),
        np.float64,
    )
    return ids, scores


@given(sd=scored_docs(), k=st.integers(1, 8))
@settings(max_examples=200, deadline=None)
def test_cursor_pages_reconstruct_full_ranking(sd, k):
    """Walking pages via the search_after cursor must reproduce the full
    (-score, doc_id) ranking exactly, with no dup or dropped doc."""
    ids, scores = sd
    order = np.lexsort((ids, -scores))
    full = [(int(ids[i]), float(scores[i])) for i in order]

    walked = []
    after = None
    while True:
        pids, pscores = _topk(ids, scores, k, after)
        if pids.size == 0:
            break
        walked.extend(
            (int(d), float(s)) for d, s in zip(pids, pscores)
        )
        after = (float(pscores[-1]), int(pids[-1]))
    assert walked == full


@given(sd=scored_docs())
@settings(max_examples=100, deadline=None)
def test_after_mask_strictly_partitions(sd):
    """Every doc is either at-or-before the cursor or after it — the mask
    keeps exactly the complement of the cursor prefix."""
    ids, scores = sd
    order = np.lexsort((ids, -scores))
    cut = len(order) // 2
    if cut == 0:
        return
    cursor_i = order[cut - 1]
    after = (float(scores[cursor_i]), int(ids[cursor_i]))
    kept_ids, _ = _after_mask(ids, scores, after)
    expected = sorted(int(ids[i]) for i in order[cut:])
    assert sorted(int(x) for x in kept_ids) == expected


@st.composite
def postings_lists(draw):
    """2-4 term posting lists over a tiny doc space, aligned arrays."""
    n_terms = draw(st.integers(2, 4))
    out = []
    for _ in range(n_terms):
        docs = sorted(draw(st.sets(st.integers(0, 25), max_size=15)))
        ids = np.array(docs, np.int64)
        tfs = np.array(
            draw(st.lists(st.integers(1, 5), min_size=len(docs),
                          max_size=len(docs))),
            np.uint64,
        )
        dls = np.full(len(docs), 10, np.uint64)
        out.append((ids, tfs, dls))
    return out


@given(tp=postings_lists(), min_match=st.integers(1, 4))
@settings(max_examples=150, deadline=None)
def test_min_should_match_counts(tp, min_match):
    idfs = np.full(len(tp), 1.0, np.float64)
    ids, scores = score_disjunctive(tp, idfs, 10.0, k=100,
                                    min_match=min_match)
    # brute-force membership counts
    from collections import Counter

    cnt = Counter()
    for lst_ids, _, _ in tp:
        for d in lst_ids:
            cnt[int(d)] += 1
    expected = sorted(d for d, c in cnt.items() if c >= min_match)
    assert sorted(int(x) for x in ids) == expected


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    pos_lists=st.lists(
        st.lists(st.integers(0, 60), min_size=1, max_size=25).map(
            lambda xs: sorted(set(xs))
        ),
        min_size=1,
        max_size=4,
    ),
    slop=st.integers(0, 5),
)
@settings(max_examples=200, deadline=None)
def test_sloppy_kernel_matches_oracle_greedy(pos_lists, slop):
    """Property: the vectorized slop kernel == the oracle's pure-python
    greedy chain on arbitrary position lists."""
    import numpy as np

    from oracle.phrase import PhraseOracle
    from sparkfts.phrase import _phrase_starts

    arrs = [np.asarray(p, dtype=np.int64) for p in pos_lists]
    got = _phrase_starts(arrs, slop)

    # oracle greedy, reimplemented over raw position lists
    from bisect import bisect_right

    m = len(pos_lists)
    exp = 0
    for p0 in pos_lists[0]:
        cur, ok = p0, True
        for plist in pos_lists[1:]:
            j = bisect_right(plist, cur)
            if j >= len(plist):
                ok = False
                break
            cur = plist[j]
        if ok and cur - p0 - (m - 1) <= slop:
            exp += 1
    assert got == exp
