"""Round-3 ADVICE regression tests: facet dedup across uncompacted
segments, highlight span safety under length-changing lowercase,
Searcher.refresh_deletes(), CLI unsupported-flag rejection."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from sparkfts.synth import gen_corpus


def test_facet_and_kernel_dedups_across_segments(spark, tmp_path):
    """A doc present in two uncompacted segments (re-crawl before merge)
    must be emitted ONCE by the AND match kernel, not once per segment."""
    from sparkfts.aggs import match_docs_batch
    from sparkfts.streaming import ingest_batch

    idx = os.path.join(str(tmp_path), "facet_dedup_idx")
    pdf = gen_corpus(30, seed=77).to_pandas()
    ingest_batch(spark.createDataFrame(pdf), 0, idx, n_shards=2, n_tbuckets=4)
    # identical re-ingest: same urls -> same doc_ids, second segment
    ingest_batch(spark.createDataFrame(pdf), 1, idx, n_shards=2, n_tbuckets=4)

    from sparkfts.analysis import tokenize

    toks = tokenize(pdf.iloc[0]["text"])
    query = " ".join(toks[:2])
    for mode in ("and", "or"):
        got = match_docs_batch(spark, idx, [(0, query)], mode=mode).collect()
        ids = [r["doc_id"] for r in got]
        assert len(ids) == len(set(ids)), f"dup doc_ids in {mode} kernel"
        assert ids, mode


def test_highlight_expanding_lowercase_spans(spark):
    """Chars whose lowercase EXPANDS ('İ' U+0130 -> 2 chars) must not
    shift fragment spans or tag placement."""
    from sparkfts.highlight import highlight

    text = "İstanbul deneme alpha beta gamma"
    assert len(text.lower()) != len(text)  # the hazard is real
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = highlight(docs, "beta", fragment_size=200).collect()[0]
    assert row["n_hit_tokens"] == 1
    assert "<em>beta</em>" in row["fragment"]
    # surrounding text is sliced at the right offsets (no drift)
    assert "alpha <em>beta</em> gamma" in row["fragment"]


def test_searcher_refresh_deletes(spark, tmp_path):
    """A long-lived Searcher picks up new tombstones via refresh_deletes()."""
    from sparkfts.deletes import delete_docs
    from sparkfts.index import build_index
    from sparkfts.searcher import Searcher

    idx = os.path.join(str(tmp_path), "refresh_idx")
    corpus = gen_corpus(80, seed=55)
    build_index(spark.createDataFrame(corpus.to_pandas()), idx,
                n_shards=2, n_tbuckets=4)
    s = Searcher(spark, idx)
    from sparkfts.analysis import tokenize

    term = tokenize(corpus.to_pandas().iloc[0]["text"])[0]
    before = s.search(term, k=50).collect()
    assert before
    victim = before[0]["doc_id"]
    delete_docs(spark, idx, [victim])
    # stale view until refreshed …
    stale = s.search(term, k=50).collect()
    assert victim in {r["doc_id"] for r in stale}
    s.refresh_deletes()
    fresh = s.search(term, k=50).collect()
    assert victim not in {r["doc_id"] for r in fresh}


def test_cli_rejects_unsupported_flag_combos(spark, tmp_path):
    """--search-after / --min-should-match with --fuzzy/--fields/--phrase
    must exit loudly, not silently ignore the flag."""
    from sparkfts.cli import main

    idx = os.path.join(str(tmp_path), "cli_idx")
    corpus = gen_corpus(20, seed=66)
    from sparkfts.index import build_index

    build_index(spark.createDataFrame(corpus.to_pandas()), idx,
                n_shards=2, n_tbuckets=4)
    with pytest.raises(SystemExit, match="search-after"):
        main(["query", "--index", idx, "--query", "web", "--fuzzy",
              "--search-after", "1.0,2"])
    with pytest.raises(SystemExit, match="min-should-match"):
        main(["query", "--index", idx, "--query", "web", "--phrase",
              "--min-should-match", "2"])


def test_cli_suggest_and_explain(spark, tmp_path, capsys):
    from sparkfts.cli import main
    from sparkfts.index import build_index
    from sparkfts.synth import gen_corpus
    from sparkfts.analysis import tokenize
    import json as _json

    idx = os.path.join(str(tmp_path), "cli_sx_idx")
    corpus = gen_corpus(60, seed=5)
    pdf = corpus.to_pandas()
    build_index(spark.createDataFrame(pdf), idx, n_shards=2, n_tbuckets=4)
    term = next(t for t in tokenize(pdf.iloc[0]["text"]) if len(t) >= 5)
    typo = term[:-1] + ("x" if term[-1] != "x" else "y")
    main(["suggest", "--index", idx, "--query", typo, "--cores", "4"])
    out = [
        _json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert any(r["suggestion"] == term for r in out)

    from sparkfts.query import bm25_index_batch

    top = bm25_index_batch(spark, idx, [(0, term, 1)], mode="or").collect()
    main(["explain", "--index", idx, "--query", term,
          "--doc-id", str(top[0]["doc_id"]), "--mode", "or", "--cores", "4"])
    out2 = [
        _json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert out2 and out2[0]["term"] == term
    assert out2[0]["contribution"] == pytest.approx(top[0]["score"], rel=1e-12)
