"""ExactSubstr dedup (Lee et al. 2022 hash-anchor variant): stats
mirror, keep-first pin, span merging, and the token-stream rewrite."""

from __future__ import annotations

import pytest

from sparkfts.analysis import tokenize


def _py_exactsubstr(texts, L):
    """Reference mirror: positional windows -> global keep-first ->
    per-doc merged spans. texts: {doc_id: text}."""
    occ = {}  # gram -> [(doc_id, pos)]
    toks = {d: tokenize(t) for d, t in texts.items()}
    for d in sorted(toks):
        ts = toks[d]
        for i in range(len(ts) - L + 1):
            occ.setdefault(" ".join(ts[i:i + L]), []).append((d, i + 1))
    dups = {}
    for locs in occ.values():
        if len(locs) < 2:
            continue
        first = min(locs)
        for loc in locs:
            if loc != first:
                dups.setdefault(loc[0], []).append(loc[1])
    out = {}
    for d, ts in toks.items():
        ps = sorted(dups.get(d, []))
        spans = []
        for p in ps:
            if spans and p <= spans[-1][1]:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + L))
            else:
                spans.append((p, p + L))
        out[d] = {
            "n_tokens": len(ts),
            "dup_windows": len(ps),
            "n_spans": len(spans),
            "removed_tokens": sum(e - s for s, e in spans),
            "spans": spans,
        }
    return out, toks


@pytest.fixture(scope="module")
def planted(spark):
    boiler = "the quick brown fox jumps over the lazy dog again"  # 10 toks
    texts = {
        1: f"alpha beta gamma {boiler} delta epsilon",
        2: f"one two three four {boiler} five six seven",
        3: f"{boiler} unique tail content here now",
        4: "completely distinct document with no duplicated passage",
        5: f"start {boiler} middle words {boiler} finish",
        6: "tiny",
    }
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    return texts, df


def test_stats_match_python_mirror(spark, planted):
    from sparkfts.ops.chunkdedup import exact_substring_stats

    texts, df = planted
    for L in (5, 8, 10):
        exp, _ = _py_exactsubstr(texts, L)
        got = {
            r["doc_id"]: r
            for r in exact_substring_stats(df, length=L).collect()
        }
        assert set(got) == set(texts)
        for d in texts:
            for k in ("n_tokens", "dup_windows", "n_spans",
                      "removed_tokens"):
                assert got[d][k] == exp[d][k], (d, L, k)


def test_keep_first_survives(spark, planted):
    """Exactly one copy of the repeated passage keeps its tokens: the
    globally-first occurrence (min doc_id, pos) is never removed."""
    from sparkfts.ops.chunkdedup import exact_substring_stats

    texts, df = planted
    got = {
        r["doc_id"]: r
        for r in exact_substring_stats(df, length=10).collect()
    }
    # doc 1 holds the first occurrence -> clean
    assert got[1]["removed_tokens"] == 0
    # every other copy is removed: docs 2, 3 lose >= the 10-token span
    assert got[2]["removed_tokens"] >= 10
    assert got[3]["removed_tokens"] >= 10
    # doc 5 has TWO copies, both non-first -> two spans or one merged
    assert got[5]["dup_windows"] >= 2
    assert got[5]["removed_tokens"] >= 20
    # distinct doc + sub-L doc untouched
    assert got[4]["removed_tokens"] == 0
    assert got[6] ["removed_tokens"] == 0 and got[6]["n_tokens"] == 1


def test_rewrite_consistent_with_stats(spark, planted):
    from sparkfts.ops.chunkdedup import (
        drop_duplicate_substrings,
        exact_substring_stats,
    )

    texts, df = planted
    L = 8
    stats = {
        r["doc_id"]: r for r in exact_substring_stats(df, length=L).collect()
    }
    rewritten = {
        r["doc_id"]: r
        for r in drop_duplicate_substrings(df, length=L).collect()
    }
    exp, toks = _py_exactsubstr(texts, L)
    for d in texts:
        r = rewritten[d]
        assert r["kept_tokens"] == (
            stats[d]["n_tokens"] - stats[d]["removed_tokens"]
        )
        covered = set()
        for s, e in exp[d]["spans"]:
            covered.update(range(s, e))
        kept = [
            t for i, t in enumerate(toks[d], start=1) if i not in covered
        ]
        assert r["kept_text"] == " ".join(kept)
        assert len(r["kept_text"].split()) in (0, r["kept_tokens"])


def test_adjacent_windows_merge_into_one_span(spark):
    """A duplicated passage longer than L produces overlapping dup
    windows that must merge to ONE span covering the whole passage."""
    from sparkfts.ops.chunkdedup import exact_substring_stats

    passage = " ".join(f"w{i}" for i in range(12))  # 12 tokens
    df = spark.createDataFrame(
        [(1, f"{passage} trailing"), (2, f"lead {passage} tail")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in exact_substring_stats(df, length=8).collect()
    }
    # doc 1 is first (pos 1) -> keeps; doc 2 loses the passage as 1 span
    assert got[1]["removed_tokens"] == 0
    assert got[2]["n_spans"] == 1
    assert got[2]["dup_windows"] == 5  # 12 - 8 + 1
    assert got[2]["removed_tokens"] == 12


def test_validation(spark, planted):
    from sparkfts.ops.chunkdedup import exact_substring_stats

    _, df = planted
    with pytest.raises(ValueError):
        exact_substring_stats(df, length=1)
