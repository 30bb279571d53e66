"""CLI wiring for the round-4 wave-2 query modes: span_near /
span_first / boosting / constant_score / rank_feature / decay /
min_score, plus the lm / termvectors / percolate subcommands and the
suggester --phrase mode. Covers both happy paths (parity with the
library call) and the fail-loud flag matrix."""

from __future__ import annotations

import json
import os

import pytest

from sparkfts.analysis import tokenize


@pytest.fixture(scope="module")
def cli_env(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index
    from sparkfts.phrase import build_positions

    base = tmp_path_factory.mktemp("cli_r4b")
    pages_path = str(base / "pages.parquet")
    idx = str(base / "idx")
    pdf = corpus.to_pandas()
    spark.createDataFrame(pdf).write.parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    build_index(pages, idx, n_shards=2, n_tbuckets=4)
    build_positions(pages, idx)
    return pages_path, idx


def _common_query(corpus, n=2):
    from collections import Counter

    c: Counter = Counter()
    for t in corpus.column("text").to_pylist():
        c.update(set(tokenize(t)))
    return " ".join(t for t, _ in c.most_common(n))


def _out_lines(capsys):
    return [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line
    ]


def test_cli_span_near_and_first(cli_env, corpus, capsys):
    from sparkfts.cli import main

    _pages, idx = cli_env
    q = _common_query(corpus)
    main(["query", "--index", idx, "--query", q, "--span-near",
          "--slop", "2", "--k", "3", "--cores", "4"])
    rows = _out_lines(capsys)
    assert rows and all("score" in r for r in rows)

    t0 = q.split()[0]
    main(["query", "--index", idx, "--query", t0, "--span-first", "10",
          "--k", "3", "--cores", "4"])
    rows = _out_lines(capsys)
    assert rows


def test_cli_boosting_and_constant_score(cli_env, corpus, capsys):
    from sparkfts.cli import main

    _pages, idx = cli_env
    q = _common_query(corpus)
    neg = _common_query(corpus, 3).split()[2]
    main(["query", "--index", idx, "--query", q, "--boosting", neg,
          "--negative-boost", "0.4", "--k", "5", "--cores", "4"])
    assert _out_lines(capsys)

    main(["query", "--index", idx, "--query", q, "--constant-score",
          "1.5", "--mode", "or", "--k", "5", "--cores", "4"])
    rows = _out_lines(capsys)
    assert rows and all(r["score"] == 1.5 for r in rows)
    ids = [r["doc_id"] for r in rows]
    assert ids == sorted(ids)  # constant_score page = smallest ids


def test_cli_min_score(cli_env, corpus, capsys):
    from sparkfts.cli import main

    _pages, idx = cli_env
    q = _common_query(corpus)
    main(["query", "--index", idx, "--query", q, "--k", "10",
          "--cores", "4"])
    base = _out_lines(capsys)
    floor = base[len(base) // 2]["score"]
    main(["query", "--index", idx, "--query", q, "--k", "10",
          "--min-score", str(floor), "--cores", "4"])
    got = _out_lines(capsys)
    assert [r["doc_id"] for r in got] == [
        r["doc_id"] for r in base if r["score"] >= floor
    ]


def test_cli_new_modes_fail_loud(cli_env):
    from sparkfts.cli import main

    _pages, idx = cli_env
    with pytest.raises(SystemExit, match="fuzzy"):
        main(["query", "--index", idx, "--query", "x", "--span-near",
              "--fuzzy"])
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(["query", "--index", idx, "--query", "x", "--span-near",
              "--constant-score", "1.0"])
    with pytest.raises(SystemExit, match="slop"):
        main(["query", "--index", idx, "--query", "x",
              "--constant-score", "1.0", "--slop", "2"])
    with pytest.raises(SystemExit, match="format"):
        main(["query", "--index", idx, "--query", "x",
              "--rank-feature", "justafield"])
    with pytest.raises(SystemExit, match="format"):
        main(["query", "--index", idx, "--query", "x",
              "--decay", "f:gauss:0"])


def test_cli_lm_and_phrase_suggest(cli_env, corpus, capsys):
    from sparkfts.cli import main

    pages_path, idx = cli_env
    # guard: no sidecar yet
    with pytest.raises(SystemExit, match="lm"):
        main(["suggest", "--index", idx, "--query", "whatever",
              "--phrase"])
    main(["lm", "--input", pages_path, "--index", idx, "--cores", "4"])
    capsys.readouterr()
    from collections import Counter

    c: Counter = Counter()
    for t in corpus.column("text").to_pylist():
        c.update(tokenize(t))
    long_term = next(t for t, _ in c.most_common() if len(t) >= 5)
    bad = long_term[:-1] + ("x" if long_term[-1] != "x" else "y")
    main(["suggest", "--index", idx, "--query", bad, "--phrase",
          "--cores", "4"])
    rows = _out_lines(capsys)
    assert any(r["phrase"] == long_term for r in rows)


def test_cli_termvectors_and_percolate(cli_env, corpus, capsys):
    from sparkfts.cli import main
    from sparkfts.index import load_docmap

    pages_path, idx = cli_env
    import pyspark  # noqa: F401  (session exists via fixture chain)

    from sparkfts.session import get_spark

    spark = get_spark(cores=4, app_name="sparkfts-tests",
                      shuffle_partitions=8)
    # termvectors needs (doc_id, text): derive ids the index's way
    docmap = load_docmap(spark, idx).select("doc_id", "url")
    pages = spark.read.parquet(pages_path).select("url", "text")
    tv_path = pages_path + ".tv"
    docmap.join(pages, "url").select("doc_id", "text").write.mode(
        "overwrite"
    ).parquet(tv_path)
    some_id = docmap.orderBy("doc_id").limit(1).collect()[0]["doc_id"]
    main(["termvectors", "--index", idx, "--input", tv_path,
          "--ids", str(some_id), "--term-statistics", "--cores", "4"])
    rows = _out_lines(capsys)
    assert rows and all(
        r["doc_id"] == some_id and r["ttf"] >= r["term_freq"]
        for r in rows
    )

    q = _common_query(corpus)
    t1, t2 = q.split()[:2]
    main(["percolate", "--input", tv_path,
          "--queries", f"1:and:{t1} {t2};2:or:{t1};3:msm.1:{t2}",
          "--cores", "4"])
    rows = _out_lines(capsys)
    assert rows and {r["query_id"] for r in rows} >= {2}
    with pytest.raises(SystemExit, match="format"):
        main(["percolate", "--input", tv_path, "--queries", "nope"])
