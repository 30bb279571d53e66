"""Tests for ops/textclean.py: repetition stats, PII redaction, URL
canonicalization — handcrafted ground truth + pinned edge cases."""

import pytest

from sparkfts.ops.textclean import (
    canonicalize_urls,
    redact_pii,
    repetition_stats,
)


@pytest.fixture(scope="module")
def spark():
    from sparkfts.session import get_spark

    s = get_spark(cores=4, app_name="test-textclean")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _e6(x: float) -> int:
    import math

    return int(math.floor(x * 1_000_000 + 0.5))


def test_repetition_stats_ground_truth(spark):
    rows = [
        (1, "a a a b"),          # 4 toks, 2 distinct; bigrams: aa,aa,ab
        (2, "x y z w"),          # all unique
        (3, ""),                 # empty
        (4, "q"),                # single token -> no bigrams
        (5, "Go, go GO!"),       # analyzer: lower + [a-z0-9]+
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["n_tokens"] == 4
    assert got[1]["dup_token_frac_e6"] == _e6(1 - 2 / 4)
    assert got[1]["dup_bigram_frac_e6"] == _e6(1 - 2 / 3)
    assert got[1]["top_token_frac_e6"] == _e6(3 / 4)
    assert got[2]["dup_token_frac_e6"] == 0
    assert got[2]["dup_bigram_frac_e6"] == 0
    assert got[2]["top_token_frac_e6"] == _e6(1 / 4)
    assert got[3] == got[3].__class__(
        doc_id=3, n_tokens=0, dup_token_frac_e6=0,
        dup_bigram_frac_e6=0, top_token_frac_e6=0,
    )
    assert got[4]["n_tokens"] == 1
    assert got[4]["dup_bigram_frac_e6"] == 0
    assert got[4]["top_token_frac_e6"] == _e6(1.0)
    # analyzer pin: "Go, go GO!" -> [go, go, go]
    assert got[5]["n_tokens"] == 3
    assert got[5]["top_token_frac_e6"] == _e6(1.0)
    assert got[5]["dup_token_frac_e6"] == _e6(1 - 1 / 3)


def test_redact_pii(spark):
    rows = [
        (1, "mail Bob.Smith+x@Example.COM or a.b@c.io now"),
        (2, "ip 10.0.0.1 and phone 555-123-4567 or 555.123.4567"),
        (3, "overlap: 123-456-7890 vs 1.2.3.4"),
        (4, "clean text, no pii at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[1]["redacted"] == "mail <EMAIL> or <EMAIL> now"
    assert got[1]["n_emails"] == 2 and got[1]["n_ipv4"] == 0
    assert got[2]["redacted"] == "ip <IP> and phone <PHONE> or <PHONE>"
    assert got[2]["n_ipv4"] == 1 and got[2]["n_phones"] == 2
    # pinned order: ipv4 is redacted before phones can see the quad
    assert got[3]["redacted"] == "overlap: <PHONE> vs <IP>"
    assert got[4]["redacted"] == rows[3][1]
    assert (
        got[4]["n_emails"] == got[4]["n_ipv4"] == got[4]["n_phones"] == 0
    )


def test_canonicalize_urls(spark):
    rows = [
        (1, "HTTPS://WWW.Foo.COM:443/Path/X?utm_source=g&id=5#frag"),
        (2, "http://bar.com:80/?utm_campaign=z"),
        (3, "https://Baz.org/p?id=1&utm_x=skip me"),
        (4, "https://a.com/p?utm_a=1&utm_b=2"),
        (5, "http://plain.net/x"),
        (6, "https://keep.io:8443/q?a=1"),  # non-default port kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: (r["canon_url"], r["host"]) for r in
           canonicalize_urls(df).collect()}
    assert got[1] == ("https://www.foo.com/Path/X?id=5", "www.foo.com")
    assert got[2] == ("http://bar.com/", "bar.com")
    assert got[3] == ("https://baz.org/p?id=1", "baz.org")
    assert got[4] == ("https://a.com/p", "a.com")
    assert got[5] == ("http://plain.net/x", "plain.net")
    assert got[6] == ("https://keep.io:8443/q?a=1", "keep.io")


def test_repetition_stats_matches_bruteforce_on_corpus(spark):
    """Cross-check the distributed stats against a pure-Python fold on
    the synthetic corpus (50 docs)."""
    import math
    import re

    from sparkfts.synth import gen_corpus
    from sparkfts.tokens import sha1_doc_id

    pdf = gen_corpus(50, seed=7).to_pandas()
    pdf["doc_id"] = sha1_doc_id(pdf["url"])
    df = spark.createDataFrame(pdf[["doc_id", "text"]])
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for _, row in pdf.iterrows():
        toks = re.findall("[a-z0-9]+", row["text"].lower())
        n = len(toks)
        r = got[row["doc_id"]]
        assert r["n_tokens"] == n
        if n:
            top = max(toks.count(t) for t in set(toks))
            assert r["top_token_frac_e6"] == int(
                math.floor(top / n * 1e6 + 0.5)
            )
            assert r["dup_token_frac_e6"] == int(
                math.floor((1 - len(set(toks)) / n) * 1e6 + 0.5)
            )
            bg = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            if bg:
                assert r["dup_bigram_frac_e6"] == int(
                    math.floor((1 - len(set(bg)) / len(bg)) * 1e6 + 0.5)
                )


# ---- adaptive per-group quality-quantile gating ----


def test_quality_quantile_filter(spark):
    import numpy as np
    import pandas as pd

    from sparkfts.ops.textstats import quality_quantile_filter

    rows = []
    for i in range(20):
        rows.append((i, "en", float(i)))          # en scores 0..19
    for i in range(5):
        rows.append((100 + i, "de", float(100 + i * 10)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "score"])
    )
    out = quality_quantile_filter(df, "score", "lang", q=0.25).collect()
    thr_en = np.percentile(np.arange(20.0), 25)      # linear interp
    thr_de = np.percentile(
        np.array([100.0, 110, 120, 130, 140]), 25
    )
    exp = {i for i in range(20) if i >= thr_en} | {
        100 + i for i in range(5) if 100 + i * 10 >= thr_de
    }
    assert {r["doc_id"] for r in out} == exp
    # threshold rides along per group
    got_thr = {r["lang"]: r["q_threshold"] for r in out}
    assert got_thr["en"] == pytest.approx(thr_en)
    assert got_thr["de"] == pytest.approx(thr_de)
    # keep='below' is the complement boundary-inclusive
    low = quality_quantile_filter(
        df, "score", "lang", q=0.25, keep="below"
    ).collect()
    assert all(r["score"] <= r["q_threshold"] for r in low)
    with pytest.raises(ValueError):
        quality_quantile_filter(df, "score", "lang", q=1.5)
    with pytest.raises(ValueError):
        quality_quantile_filter(df, "score", "lang", keep="between")
