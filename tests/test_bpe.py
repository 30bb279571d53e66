"""BPE training + segmentation: pinned classic algorithm vs an
independent brute-force mirror and a hand-computed micro-case."""

from __future__ import annotations

from collections import Counter

import pytest

from sparkfts.analysis import tokenize
from sparkfts.ops.bpe import EOW, apply_bpe, learn_bpe
from sparkfts.synth import gen_corpus
from sparkfts.tokens import sha1_doc_id


def _brute_bpe(texts, n_merges, max_words=None):
    """Independent reference: same pinned spec, written differently."""
    wc = Counter()
    for t in texts:
        wc.update(tokenize(t))
    items = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    if max_words is not None:
        items = items[:max_words]
    vocab = {tuple(w) + (EOW,): c for w, c in items}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < 2:
            break
        (a, b) = best[0]
        merges.append((a, b))
        nv = {}
        for syms, c in vocab.items():
            s = list(syms)
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            key = tuple(out)
            nv[key] = nv.get(key, 0) + c
        vocab = nv
    return merges


def test_bpe_micro_case(spark):
    # classic toy: 'low' x5, 'lowest' x2 -> first merges build 'low'
    rows = [(0, "low low low low low"), (1, "lowest lowest")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = learn_bpe(df, n_merges=3)
    assert merges == _brute_bpe([t for _, t in rows], 3)
    assert merges[0] == ("l", "o")  # lo: 7 occurrences, lexi-first tie
    assert merges[1] == ("lo", "w")  # low: 7


def test_bpe_matches_brute_on_corpus(spark):
    import pandas as pd

    tbl = gen_corpus(80, seed=71).to_pandas()
    tbl["doc_id"] = sha1_doc_id(tbl["url"])
    df = spark.createDataFrame(tbl[["doc_id", "text"]])
    merges = learn_bpe(df, n_merges=25, max_words=300)
    exp = _brute_bpe(tbl["text"].tolist(), 25, max_words=300)
    assert merges == exp
    assert len(merges) == 25

    # segmentation: total bpe tokens shrinks as merges apply, and a
    # zero-merge segmentation is chars+1 per word
    seg = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in apply_bpe(df, merges).collect()
    }
    seg0 = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in apply_bpe(df, []).collect()
    }
    for _, row in tbl.iterrows():
        d = int(row["doc_id"])
        ws = tokenize(row["text"])
        assert seg[d][0] == len(ws)
        assert seg0[d] == sum(len(w) + 1 for w in ws)
        assert seg[d][1] <= seg0[d]
        # independent greedy-encode check on one doc
    d0 = int(tbl.iloc[0]["doc_id"])
    ranks = {m: i for i, m in enumerate(merges)}

    def enc(word):
        syms = list(word) + [EOW]
        while True:
            cands = [
                (ranks[p], i)
                for i, p in enumerate(zip(syms, syms[1:]))
                if p in ranks
            ]
            if not cands:
                return syms
            _, i = min(cands)
            syms[i:i + 2] = [syms[i] + syms[i + 1]]

    exp_tokens = sum(len(enc(w)) for w in tokenize(tbl.iloc[0]["text"]))
    assert seg[d0][1] == exp_tokens


def test_bpe_validation(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        learn_bpe(df, n_merges=0)
    # nothing repeats twice -> early stop, no merges
    assert learn_bpe(df, n_merges=5) == []
