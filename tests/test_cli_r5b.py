"""CLI wiring for the round-5 wave-2 query modes: --span-multi,
--ids, --exists — happy paths + fail-loud matrix."""

from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module")
def cli_env(spark, corpus, tmp_path_factory):
    from pyspark.sql import functions as F

    from sparkfts.index import build_index
    from sparkfts.phrase import build_positions

    base = tmp_path_factory.mktemp("cli_r5b")
    idx = str(base / "idx")
    pages = spark.createDataFrame(corpus.to_pandas()).withColumn(
        "n_chars", F.length("text")
    )
    build_index(pages, idx, n_shards=2, n_tbuckets=4,
                docvalue_cols=["lang"])
    build_positions(pages, idx)
    return idx


def _out_lines(capsys):
    return [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line
    ]


def test_cli_span_multi_matches_library(cli_env, spark, capsys):
    from sparkfts.cli import main
    from sparkfts.spans import span_multi_batch

    main(["query", "--index", cli_env, "--query", "s",
          "--span-multi", "prefix", "--k", "5", "--cores", "4"])
    rows = [r for r in _out_lines(capsys) if "rank" in r]
    want = span_multi_batch(
        spark, cli_env, [(0, "s", 5)], kind="prefix"
    ).collect()
    assert [(r["rank"], r["doc_id"]) for r in rows] == [
        (r["rank"], r["doc_id"]) for r in want
    ]
    # --max-expansions is ALLOWED with --span-multi
    main(["query", "--index", cli_env, "--query", "s",
          "--span-multi", "prefix", "--k", "5", "--max-expansions", "2",
          "--cores", "4"])
    capped = [r for r in _out_lines(capsys) if "rank" in r]
    want2 = span_multi_batch(
        spark, cli_env, [(0, "s", 5)], kind="prefix", max_expansions=2
    ).collect()
    assert [(r["rank"], r["doc_id"]) for r in capped] == [
        (r["rank"], r["doc_id"]) for r in want2
    ]


def test_cli_ids_and_exists(cli_env, spark, capsys):
    from sparkfts.cli import main
    from sparkfts.index import load_docmap

    ids = [
        r["doc_id"]
        for r in load_docmap(spark, cli_env).limit(3).collect()
    ]
    arg = ",".join(str(i) for i in ids) + ",99999999999"
    main(["query", "--index", cli_env, "--query", "", "--ids", arg,
          "--k", "10", "--cores", "4"])
    rows = [r for r in _out_lines(capsys) if "rank" in r]
    assert sorted(r["doc_id"] for r in rows) == sorted(ids)
    assert all(r["score"] == 1.0 for r in rows)

    main(["query", "--index", cli_env, "--query", "", "--exists",
          "lang", "--k", "4", "--cores", "4"])
    rows = [r for r in _out_lines(capsys) if "rank" in r]
    assert len(rows) == 4 and all(r["score"] == 1.0 for r in rows)


def test_cli_r5b_fail_loud(cli_env):
    from sparkfts.cli import main

    with pytest.raises(SystemExit, match="replaces QUERY"):
        main(["query", "--index", cli_env, "--query", "x",
              "--ids", "3"])
    with pytest.raises(SystemExit, match="no doc value"):
        main(["query", "--index", cli_env, "--query", "",
              "--exists", "nosuch"])
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(["query", "--index", cli_env, "--query", "s",
              "--span-multi", "prefix", "--ids", "3"])
    with pytest.raises(SystemExit, match="not supported"):
        main(["query", "--index", cli_env, "--query", "s",
              "--span-multi", "prefix", "--filter", "lang='en'"])
    with pytest.raises(SystemExit, match="must be integers"):
        main(["query", "--index", cli_env, "--query", "",
              "--ids", "3,x"])
