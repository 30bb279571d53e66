"""Round-4 ADVICE regression tests: CLI --max-expansions plumbing,
explain_score multi-segment dedup, BM25F multi-segment tf dedup, and
Clause.operator honored on the single-field/scan paths (the operator
parity itself is pinned in tests/test_booltree.py)."""

from __future__ import annotations

import os

import pytest

from sparkfts.synth import gen_corpus


def test_explain_score_dedups_across_segments(spark, tmp_path):
    """A doc present in two uncompacted segments must yield ONE row per
    term (previously: one per Arrow batch -> doubled contributions)."""
    from sparkfts.analysis import tokenize
    from sparkfts.query import explain_score
    from sparkfts.streaming import ingest_batch

    idx = os.path.join(str(tmp_path), "explain_dup_idx")
    pdf = gen_corpus(30, seed=91).to_pandas()
    ingest_batch(spark.createDataFrame(pdf), 0, idx, n_shards=2, n_tbuckets=4)
    ingest_batch(spark.createDataFrame(pdf), 1, idx, n_shards=2, n_tbuckets=4)

    idx1 = os.path.join(str(tmp_path), "explain_single_idx")
    ingest_batch(spark.createDataFrame(pdf), 0, idx1, n_shards=2, n_tbuckets=4)

    from sparkfts.index import load_docmap

    toks = tokenize(pdf.iloc[0]["text"])
    query = " ".join(toks[:2])
    doc_id = load_docmap(spark, idx1).orderBy("doc_id").limit(1).collect()[0][
        "doc_id"
    ]
    dup = explain_score(spark, idx, query, int(doc_id), mode="or").collect()
    single = explain_score(
        spark, idx1, query, int(doc_id), mode="or"
    ).collect()
    assert dup, "test premise: the doc matches"
    terms = [r["term"] for r in dup]
    assert len(terms) == len(set(terms)), "duplicate per-term rows"
    got = {r["term"]: (r["tf"], r["doclen"]) for r in dup}
    exp = {r["term"]: (r["tf"], r["doclen"]) for r in single}
    assert got == exp, "tf/doclen double-counted across segments"


def test_bm25f_kernel_dedups_duplicated_runs():
    """The BM25F shard kernel folds a doc's tf into tfc ONCE even when
    the doc's postings run appears in two uncompacted segments (the
    df_any dictionary already np.unique-dedups the same runs)."""
    import numpy as np
    import pandas as pd

    from sparkfts.codec import delta_encode, encode_varint
    from sparkfts.multifield import _make_bm25f_scorer

    def row(field, term, ids, tfs, dls):
        ids = np.asarray(ids, np.int64)
        return {
            "field": field,
            "term": term,
            "doc_ids": encode_varint(delta_encode(ids)),
            "tfs": encode_varint(np.asarray(tfs, np.uint64)),
            "doclens": encode_varint(np.asarray(dls, np.uint64)),
        }

    single = pd.DataFrame(
        [row("text", "alpha", [1, 2], [3, 1], [10, 12])]
    )
    dup = pd.DataFrame(
        [
            row("text", "alpha", [1, 2], [3, 1], [10, 12]),
            row("text", "alpha", [1], [3], [10]),  # re-crawled doc 1
        ]
    )
    mk = lambda: _make_bm25f_scorer(
        [(0, ["alpha"], 10)],
        {"alpha": 1.5},
        [("text", 1.0)],
        {"text": 11.0},
        "or",
    )
    got_single = mk()(single)
    got_dup = mk()(dup)
    assert list(got_dup["doc_id"]) == list(got_single["doc_id"])
    assert list(got_dup["score"]) == list(got_single["score"])


def test_cli_max_expansions_threading(spark, tmp_path, monkeypatch, capsys):
    """--max-expansions reaches the fuzzy paths; non-expansion paths
    reject it loudly instead of silently ignoring it."""
    from sparkfts.cli import main
    from sparkfts.index import build_index

    idx = os.path.join(str(tmp_path), "cli_fuzzy_idx")
    pdf = gen_corpus(60, seed=93).to_pandas()
    build_index(spark.createDataFrame(pdf), idx, n_shards=2, n_tbuckets=4)

    import sparkfts.cli as cli_mod

    monkeypatch.setattr(cli_mod, "_spark", lambda *a, **k: spark)

    captured = {}
    import sparkfts.query as qmod

    real = qmod.bm25_index_fuzzy_batch

    def spy(*args, **kwargs):
        captured["max_expansions"] = kwargs.get("max_expansions")
        return real(*args, **kwargs)

    monkeypatch.setattr(qmod, "bm25_index_fuzzy_batch", spy)
    from sparkfts.analysis import tokenize

    term = tokenize(pdf.iloc[0]["text"])[0]
    main(
        ["query", "--index", idx, "--query", term, "--fuzzy",
         "--max-expansions", "2", "--cores", "2"]
    )
    capsys.readouterr()
    assert captured.get("max_expansions") == 2

    # plain query path: loud rejection, not a silent drop
    with pytest.raises(SystemExit):
        main(
            ["query", "--index", idx, "--query", term,
             "--max-expansions", "2", "--cores", "2"]
        )
    # phrase path: loud rejection too
    with pytest.raises(SystemExit):
        main(
            ["query", "--index", idx, "--query", term, "--phrase",
             "--max-expansions", "2", "--cores", "2"]
        )
