"""ES prefix query: dictionary expansion + best-expansion-wins scoring.

Expected values computed independently in pure Python from the corpus
(pinned analyzer, BM25 stats, max-over-expansions formula per the module
docstring spec).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pytest

from sparkfts import BM25_B, BM25_K1
from sparkfts.analysis import tokenize
from sparkfts.index import build_index
from sparkfts.prefix import expand_prefix, prefix_topk_batch
from sparkfts.synth import gen_corpus
from sparkfts.tokens import sha1_doc_id


@pytest.fixture(scope="module")
def pcorpus():
    return gen_corpus(200, seed=17)


@pytest.fixture(scope="module")
def pidx(spark, pcorpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("prefix") / "idx")
    build_index(spark.createDataFrame(pcorpus.to_pandas()), d,
                n_shards=4, n_tbuckets=8)
    return d


def _pick_prefix(pcorpus, min_terms=3):
    vocab = sorted(
        {t for txt in pcorpus.column("text").to_pylist() for t in tokenize(txt)}
    )
    from collections import Counter as C

    for ln in (2, 1, 3):
        pres = C(t[:ln] for t in vocab if len(t) >= ln)
        for p, n in pres.most_common():
            if n >= min_terms:
                return p
    raise AssertionError("no multi-term prefix in corpus vocab")


def _py_oracle(pcorpus, prefix, k):
    texts = pcorpus.column("text").to_pylist()
    ids = sha1_doc_id(pd.Series(pcorpus.column("url").to_pylist())).tolist()
    toks = [tokenize(t) for t in texts]
    n_docs = len(texts)
    avgdl = sum(len(t) for t in toks) / n_docs
    df: Counter = Counter()
    for t in toks:
        df.update(set(t))
    terms = sorted(t for t in df if t.startswith(prefix))
    scored = []
    for d, tk in zip(ids, toks):
        dl = len(tk)
        tf = Counter(tk)
        best = 0.0
        for t in terms:
            if tf[t]:
                idf = math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
                norm = BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl)
                best = max(
                    best, idf * (tf[t] / (tf[t] + norm)) * (BM25_K1 + 1)
                )
        if best > 0:
            scored.append((int(d), best))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def test_expand_prefix_range(spark, pcorpus, pidx):
    p = _pick_prefix(pcorpus)
    exps = expand_prefix(spark, pidx, [(0, p)], 200)[0]
    vocab = {
        t for txt in pcorpus.column("text").to_pylist() for t in tokenize(txt)
    }
    assert [t for t, _ in exps] == sorted(t for t in vocab if t.startswith(p))
    assert len(exps) >= 3
    # max_expansions caps in sorted term order
    capped = expand_prefix(spark, pidx, [(0, p)], 200, max_expansions=2)[0]
    assert capped == exps[:2]


def test_prefix_topk_matches_py_oracle(spark, pcorpus, pidx):
    p = _pick_prefix(pcorpus)
    got = prefix_topk_batch(spark, pidx, [(0, p, 10)]).collect()
    exp = _py_oracle(pcorpus, p, 10)
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-9)
    assert got  # fixture sanity


def test_prefix_single_term_equals_whole_word(spark, pcorpus, pidx):
    """A prefix matching exactly one dictionary term scores like that
    term's single-term OR query (same formula, one expansion)."""
    from sparkfts.query import bm25_index_batch

    vocab = sorted(
        {t for txt in pcorpus.column("text").to_pylist() for t in tokenize(txt)}
    )
    # find a term that is the unique extension of its own full length
    target = next(
        t for t in vocab
        if sum(1 for u in vocab if u.startswith(t)) == 1
    )
    a = prefix_topk_batch(spark, pidx, [(0, target, 10)]).collect()
    b = bm25_index_batch(spark, pidx, [(0, target, 10)], mode="or").collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_prefix_no_match(spark, pcorpus, pidx):
    assert prefix_topk_batch(spark, pidx, [(0, "zzzzqq", 5)]).collect() == []


def test_prefix_respects_tombstones(spark, pcorpus, pidx, tmp_path):
    import shutil

    from sparkfts.deletes import delete_docs

    idx2 = str(tmp_path / "pidx2")
    shutil.copytree(pidx, idx2)
    p = _pick_prefix(pcorpus)
    base = prefix_topk_batch(spark, idx2, [(0, p, 10_000)]).collect()
    victim = base[0]["doc_id"]
    delete_docs(spark, idx2, [victim])
    after = prefix_topk_batch(spark, idx2, [(0, p, 20)]).collect()
    assert victim not in {r["doc_id"] for r in after}
    exp = [(r["doc_id"], r["score"]) for r in base
           if r["doc_id"] != victim][:20]
    assert [(r["doc_id"], r["score"]) for r in after] == exp


def test_wildcard_pattern_regex():
    from sparkfts.prefix import _pattern_to_regex
    import re

    rx = re.compile(_pattern_to_regex("da*a"))
    assert rx.match("data") and rx.match("daa") and not rx.match("dab")
    rx2 = re.compile(_pattern_to_regex("t?e"))
    assert rx2.match("the") and not rx2.match("te") and not rx2.match("thee")


def test_wildcard_topk_matches_py_oracle(spark, pcorpus, pidx):
    """Wildcard with a mid-pattern `*`: same best-expansion-wins scores
    as the python oracle restricted to the regex-matching vocab."""
    import re as _re

    from sparkfts.prefix import _pattern_to_regex, wildcard_topk_batch

    p = _pick_prefix(pcorpus)
    pattern = p + "*"  # equivalent to the prefix query
    a = wildcard_topk_batch(spark, pidx, [(0, pattern, 10)]).collect()
    exp = _py_oracle(pcorpus, p, 10)
    assert [(r["doc_id"], r["score"]) for r in a] == exp

    # `?` wildcard: single-char hole in a real vocab term
    vocab = sorted(
        {t for txt in pcorpus.column("text").to_pylist() for t in tokenize(txt)}
    )
    term = next(t for t in vocab if len(t) >= 4)
    holed = term[:1] + "?" + term[2:]
    rx = _re.compile(_pattern_to_regex(holed))
    matching = [t for t in vocab if rx.match(t)]
    assert term in matching
    got = wildcard_topk_batch(spark, pidx, [(0, holed, 10)]).collect()
    assert got  # matches at least the original term's docs
    # brute check: equals python oracle over the matching term set
    import math
    from collections import Counter

    texts = pcorpus.column("text").to_pylist()
    ids = sha1_doc_id(pd.Series(pcorpus.column("url").to_pylist())).tolist()
    toks = [tokenize(t) for t in texts]
    n_docs = len(texts)
    avgdl = sum(len(t) for t in toks) / n_docs
    df = Counter()
    for t in toks:
        df.update(set(t))
    scored = []
    for d, tk in zip(ids, toks):
        tf = Counter(tk)
        best = 0.0
        for t in matching:
            if tf[t]:
                idf = math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
                norm = BM25_K1 * (1 - BM25_B + BM25_B * len(tk) / avgdl)
                best = max(best, idf * (tf[t] / (tf[t] + norm)) * (BM25_K1 + 1))
        if best > 0:
            scored.append((int(d), best))
    scored.sort(key=lambda x: (-x[1], x[0]))
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (d, pytest.approx(s, rel=1e-9)) for d, s in scored[:10]
    ]


# ---- ES regexp query (Java/RE2 common subset, flags=NONE) ----


def test_regexp_validation():
    from sparkfts.prefix import validate_regexp

    for bad in ("a~b", "a@", "#", "a&b", "a<1-2>", "(a", "a\\1"):
        with pytest.raises(ValueError):
            validate_regexp(bad)
    # escaped Lucene operators and plain RE2 syntax are fine
    for ok in ("a\\~b", "sp[a-z]+", "(sp|st)ark", "a.c", "x{1,3}y"):
        validate_regexp(ok)


def test_regexp_literal_prefix():
    from sparkfts.prefix import regexp_literal_prefix

    assert regexp_literal_prefix("spark") == "spark"
    assert regexp_literal_prefix("spa.*k") == "spa"
    assert regexp_literal_prefix("ab*c") == "a"  # b is quantified
    assert regexp_literal_prefix(".*foo") == ""
    assert regexp_literal_prefix("s(p|t)a") == "s"
    assert regexp_literal_prefix("ab{2}") == "a"


def test_regexp_prefix_equivalence(spark, pcorpus, pidx):
    """`p[a-z0-9]*` is the regexp spelling of the prefix query `p` —
    identical pages, scores, and expansion sets."""
    from sparkfts.prefix import expand_regexp, regexp_topk_batch

    p = _pick_prefix(pcorpus)
    a = regexp_topk_batch(spark, pidx, [(0, p + "[a-z0-9]*", 10)]).collect()
    exp = _py_oracle(pcorpus, p, 10)
    assert [(r["doc_id"], r["score"]) for r in a] == exp
    exps = expand_regexp(spark, pidx, [(0, p + "[a-z0-9]*")], 200)[0]
    vocab = {
        t for txt in pcorpus.column("text").to_pylist() for t in tokenize(txt)
    }
    assert [t for t, _ in exps] == sorted(
        t for t in vocab if t.startswith(p)
    )


def test_regexp_is_anchored(spark, pcorpus, pidx):
    """ES regexp matches the WHOLE term: a bare literal matches only
    that exact dictionary term, never its extensions."""
    from sparkfts.prefix import expand_regexp

    vocab = sorted(
        {t for txt in pcorpus.column("text").to_pylist() for t in tokenize(txt)}
    )
    # a term that is a strict prefix of another vocab term
    t = next(
        (t for t in vocab
         if any(u != t and u.startswith(t) for u in vocab)), None
    )
    if t is None:
        pytest.skip("no nested vocab terms at this seed")
    exps = expand_regexp(spark, pidx, [(0, t)], 200)[0]
    assert [x for x, _ in exps] == [t]


def test_regexp_alternation_matches_brute(spark, pcorpus, pidx):
    """(t1|t2) scores as best-of over exactly those two terms; also
    pins that patterns are NOT case-folded (an uppercase class still
    compiles and matches nothing against the lowercase dictionary)."""
    import math
    import re as _re
    from collections import Counter

    from sparkfts.prefix import expand_regexp, regexp_topk_batch

    vocab = sorted(
        {t for txt in pcorpus.column("text").to_pylist() for t in tokenize(txt)}
    )
    t1, t2 = vocab[3], vocab[11]
    pattern = f"({t1}|{t2})"
    got = regexp_topk_batch(spark, pidx, [(0, pattern, 10)]).collect()
    texts = pcorpus.column("text").to_pylist()
    ids = sha1_doc_id(pd.Series(pcorpus.column("url").to_pylist())).tolist()
    toks = [tokenize(t) for t in texts]
    n_docs = len(texts)
    avgdl = sum(len(t) for t in toks) / n_docs
    df = Counter()
    for t in toks:
        df.update(set(t))
    scored = []
    for d, tk in zip(ids, toks):
        tf = Counter(tk)
        best = 0.0
        for t in (t1, t2):
            if tf[t]:
                idf = math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
                norm = BM25_K1 * (1 - BM25_B + BM25_B * len(tk) / avgdl)
                best = max(best, idf * (tf[t] / (tf[t] + norm)) * (BM25_K1 + 1))
        if best > 0:
            scored.append((int(d), best))
    scored.sort(key=lambda x: (-x[1], x[0]))
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (d, pytest.approx(s, rel=1e-9)) for d, s in scored[:10]
    ]
    # no case folding: [A-Z]+ stays uppercase -> zero dictionary hits
    assert expand_regexp(spark, pidx, [(0, "[A-Z]+")], 200)[0] == []
