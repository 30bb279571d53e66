"""CLI wiring for the wave-4 surfaces: --scroll, the sorted and sparse
subcommands, --fuzzy-prefix-length — happy paths + fail-loud matrix."""

from __future__ import annotations

import json

import pytest

from sparkfts.analysis import tokenize


@pytest.fixture(scope="module")
def cli_env(spark, corpus, tmp_path_factory):
    from pyspark.sql import functions as F

    from sparkfts.index import build_index

    base = tmp_path_factory.mktemp("cli_r4c")
    pages_path = str(base / "pages.parquet")
    idx = str(base / "idx")
    pdf = corpus.to_pandas()
    spark.createDataFrame(pdf).write.parquet(pages_path)
    pages = spark.read.parquet(pages_path).withColumn(
        "n_chars", F.length("text")
    )
    build_index(pages, idx, n_shards=2, n_tbuckets=4,
                docvalue_cols=["n_chars"])
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


def test_cli_scroll_streams_full_match_set(cli_env, corpus, capsys):
    from sparkfts.cli import main

    _pages, idx = cli_env
    q = _common_query(corpus, 1)
    main(["query", "--index", idx, "--query", q, "--scroll", "7",
          "--mode", "or", "--cores", "4"])
    rows = _out_lines(capsys)
    assert rows
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # full match set, not a single page
    main(["query", "--index", idx, "--query", q, "--k", "100000",
          "--mode", "or", "--cores", "4"])
    assert len(rows) == len(_out_lines(capsys))


def test_cli_scroll_fail_loud(cli_env):
    from sparkfts.cli import main

    _pages, idx = cli_env
    for extra in (
        ["--fuzzy"],
        ["--phrase"],
        ["--prefix"],
        ["--offset", "3"],
        ["--filter", "n_chars > 0"],
        ["--syntax", "query_string"],
        ["--synonyms", "a:b"],
    ):
        with pytest.raises(SystemExit):
            main(["query", "--index", idx, "--query", "x",
                  "--scroll", "5", "--cores", "4"] + extra)


def test_cli_sorted_build_and_query(cli_env, capsys):
    from sparkfts.cli import main

    _pages, idx = cli_env
    main(["sorted", "--index", idx, "--field", "n_chars", "--build",
          "--k", "5", "--cores", "4"])
    rows = _out_lines(capsys)
    assert "sidecar" in rows[0]
    hits = rows[1:]
    assert len(hits) == 5
    vals = [r["sort_value"] for r in hits]
    assert vals == sorted(vals, reverse=True)
    with pytest.raises(SystemExit):
        main(["sorted", "--index", idx, "--field", "n_chars",
              "--cores", "4"])  # nothing to do


def test_cli_sparse_build_and_query(cli_env, corpus, capsys):
    from sparkfts.cli import main

    pages, idx = cli_env
    main(["sparse", "--index", idx, "--build-from", pages,
          "--cores", "4"])
    assert "sparse_index" in _out_lines(capsys)[0]
    q = _common_query(corpus, 1)
    main(["sparse", "--index", idx, "--weights", f"{q}:2.0",
          "--k", "4", "--cores", "4"])
    rows = _out_lines(capsys)
    assert rows and all(r["dot"] > 0 for r in rows)
    for bad in (["--weights", "nocolon"], []):
        with pytest.raises(SystemExit):
            main(["sparse", "--index", idx, "--cores", "4"] + bad)


def test_cli_fuzzy_prefix_length(cli_env, corpus, capsys):
    from sparkfts.cli import main

    _pages, idx = cli_env
    term = _common_query(corpus, 1)
    typo = term[0] + ("x" if term[1] != "x" else "q") + term[2:]
    main(["query", "--index", idx, "--query", typo, "--fuzzy",
          "--fuzzy-prefix-length", "1", "--k", "3", "--mode", "or",
          "--cores", "4"])
    assert _out_lines(capsys)
    with pytest.raises(SystemExit):
        main(["query", "--index", idx, "--query", typo,
              "--fuzzy-prefix-length", "1", "--cores", "4"])


def test_cli_msearch_and_field_caps(cli_env, corpus, capsys, tmp_path):
    import os

    from sparkfts.cli import main

    _pages, idx = cli_env
    q = _common_query(corpus, 1)
    f = os.path.join(str(tmp_path), "q.jsonl")
    with open(f, "w") as fh:
        fh.write(json.dumps({"query": q}) + "\n")
        fh.write(json.dumps({"query": q + " zzz", "k": 3}) + "\n")
        fh.write("\n")  # blank lines skipped
    main(["msearch", "--index", idx, "--file", f, "--mode", "or",
          "--cores", "4"])
    rows = _out_lines(capsys)
    assert {r["query_id"] for r in rows} == {0, 1}
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert [r["rank"] for r in by_q[0]] == list(
        range(1, len(by_q[0]) + 1)
    )
    assert len(by_q[1]) <= 3
    # malformed / empty files fail loud
    bad = os.path.join(str(tmp_path), "bad.jsonl")
    with open(bad, "w") as fh:
        fh.write('{"no_query": 1}\n')
    with pytest.raises(SystemExit):
        main(["msearch", "--index", idx, "--file", bad, "--cores", "4"])
    empty = os.path.join(str(tmp_path), "empty.jsonl")
    open(empty, "w").close()
    with pytest.raises(SystemExit):
        main(["msearch", "--index", idx, "--file", empty,
              "--cores", "4"])

    main(["field-caps", "--index", idx, "--cores", "4"])
    caps = _out_lines(capsys)[0]
    assert caps["text"]["searchable"]
    assert caps["n_chars"]["aggregatable"]
