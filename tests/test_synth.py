"""Synthetic corpus generator: determinism + invariants (FIXTURES.md §1-2)."""

import numpy as np

from sparkfts.analysis import extract_text, tokenize
from sparkfts.synth import gen_corpus, gen_queries


def test_deterministic():
    a = gen_corpus(50, seed=42)
    b = gen_corpus(50, seed=42)
    assert a.equals(b)
    c = gen_corpus(50, seed=1)
    assert not a.equals(c)


def test_schema_and_invariants():
    t = gen_corpus(100, seed=42)
    assert t.column_names == ["url", "warc_ts", "html", "text", "lang"]
    urls = t.column("url").to_pylist()
    assert len(set(urls)) == 100  # unique key
    htmls = t.column("html").to_pylist()
    texts = t.column("text").to_pylist()
    # the input_hint invariant: stored text is byte-identical to extraction
    for h, x in zip(htmls, texts):
        assert extract_text(h) == x
    assert all(t.column("lang").to_pylist()[i] in {"en", "es", "de", "fr", "zh"} for i in range(100))


def test_head_term_skew():
    t = gen_corpus(300, seed=42)
    texts = t.column("text").to_pylist()
    from collections import Counter

    df = Counter()
    for x in texts:
        df.update(set(tokenize(x)))
    # Zipf head: most common term should appear in a large fraction of docs
    top_df = df.most_common(1)[0][1]
    assert top_df > 0.4 * len(texts)


def test_queries_cover_spectrum():
    t = gen_corpus(200, seed=42)
    qs = gen_queries(t.column("text").to_pylist())
    assert len(qs) == 50
    assert [q["query_id"] for q in qs] == list(range(50))
    ks = {q["k"] for q in qs}
    assert {1, 10, 100} <= ks
    assert any(q["query"] == "zzqqxxnotaword" for q in qs)
    # deterministic
    qs2 = gen_queries(t.column("text").to_pylist())
    assert qs == qs2
