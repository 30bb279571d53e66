"""query_string syntax (sparkfts.querystring).

Two layers: (a) PARSE — the pinned grammar produces exactly the
documented Bool/Clause IR (and fails loud outside the subset); (b)
EXECUTE — a parsed query returns byte-identical results to the same IR
composed by hand through the single-pass bool-tree kernel (so the
parser adds surface syntax, zero new scoring semantics).
"""

from __future__ import annotations

import pytest

from sparkfts.analysis import tokenize
from sparkfts.querybuilder import Bool, Clause, SearchRequest
from sparkfts.querystring import (
    QueryStringError,
    parse_query_string,
    query_string_topk_batch,
)


def C(w, fields=("text",), fuzz="0"):
    return Clause(query=w, fields=fields, operator="and", fuzziness=fuzz)


# ---------------------------------------------------------------------------
# parse shapes
# ---------------------------------------------------------------------------


def test_parse_single_term():
    assert parse_query_string("spark") == C("spark")


def test_parse_and_or_nesting():
    assert parse_query_string("a AND b") == Bool(must=(C("a"), C("b")))
    assert parse_query_string("a OR b") == Bool(should=(C("a"), C("b")))
    got = parse_query_string("a AND (b OR c) AND NOT d")
    assert got == Bool(
        must=(C("a"), Bool(should=(C("b"), C("c")))),
        must_not=(C("d"),),
    )


def test_parse_operator_aliases():
    assert parse_query_string("a && b") == parse_query_string("a AND b")
    assert parse_query_string("a || b") == parse_query_string("a OR b")
    assert parse_query_string("a !b") == parse_query_string("a NOT b")


def test_parse_occur_modifiers_default_or():
    got = parse_query_string("+a b -c")
    assert got == Bool(must=(C("a"),), should=(C("b"),), must_not=(C("c"),))


def test_parse_default_operator_and():
    got = parse_query_string("a b", default_operator="and")
    assert got == Bool(must=(C("a"), C("b")))


def test_parse_fuzzy_and_fields():
    assert parse_query_string("spark~") == C("spark", fuzz="AUTO")
    assert parse_query_string("title:spark") == C("spark", fields=("title",))
    got = parse_query_string("title:(a b~)")
    assert got == Bool(
        should=(C("a", fields=("title",)),
                C("b", fields=("title",), fuzz="AUTO")),
    )
    # the field override is scoped to the group
    got2 = parse_query_string("title:a AND b")
    assert got2 == Bool(must=(C("a", fields=("title",)), C("b")))


def test_parse_implicit_adjacent_not():
    # "a NOT b" == a, excluding b
    assert parse_query_string("a NOT b") == Bool(
        should=(C("a"),), must_not=(C("b"),)
    )


def test_parse_hyphenated_word_is_one_clause():
    """Round-4 ADVICE: mid-word '-' is term text (Lucene/ES query_string),
    NOT a prohibit operator — 'spark-job' lexes as ONE word whose analyzed
    token stream forms one conjunctive clause."""
    assert parse_query_string("spark-job") == C("spark-job")
    # the pinned analyzer splits it into the conjunctive stream
    assert tokenize("spark-job") == ["spark", "job"]
    # prohibit still applies at clause start (after whitespace)
    assert parse_query_string("spark -job") == Bool(
        should=(C("spark"),), must_not=(C("job"),)
    )
    assert parse_query_string("+alpha-beta gamma") == Bool(
        must=(C("alpha-beta"),), should=(C("gamma"),)
    )
    # hyphenated word inside a field group keeps the field
    assert parse_query_string("title:spark-job") == C(
        "spark-job", fields=("title",)
    )


@pytest.mark.parametrize(
    "bad,frag",
    [
        ('"data stream"', "quoted"),
        # ^boost is SUPPORTED since round 5 (test_boost.py); only a
        # malformed boost rejects
        ("spark^x", "invalid boost"),
        ("-a", "positive"),
        ("NOT a", "positive"),
        ("+a AND b", "ambiguous"),
        ("a OR NOT b", "parenthesize"),
        ("a OR -b", "parenthesize"),
        ("", "empty"),
        ("(a AND b", "end of query"),
        ("a)", "unexpected"),
        ("*", "match-all"),
        ("a AND", "end of query"),
    ],
)
def test_parse_rejects(bad, frag):
    with pytest.raises(QueryStringError, match=frag):
        parse_query_string(bad)


def test_parse_bad_default_operator():
    with pytest.raises(QueryStringError, match="default_operator"):
        parse_query_string("a", default_operator="xor")


# ---------------------------------------------------------------------------
# execution parity vs hand-composed IR
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def qs_index(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index

    d = str(tmp_path_factory.mktemp("qs_idx"))
    build_index(
        spark.createDataFrame(corpus.to_pandas()), d,
        n_shards=4, n_tbuckets=8,
    )
    return d


def _terms(corpus, n=4):
    from collections import Counter

    c: Counter = Counter()
    for t in corpus.column("text").to_pylist():
        c.update(set(tokenize(t)))
    return [t for t, _ in c.most_common(n)]


def _run_ir(spark, idx, node, k):
    from sparkfts.booltree import bool_topk_batch

    req = SearchRequest(clauses=(node,), k=k)
    return [
        (r["rank"], r["doc_id"], r["score"])
        for r in bool_topk_batch(spark, idx, [req]).collect()
    ]


def test_execute_matches_hand_ir(spark, corpus, qs_index):
    a, b, c, d = _terms(corpus)
    q = f"{a} AND ({b} OR {c}) AND NOT {d}"
    got = query_string_topk_batch(spark, qs_index, [(7, q, 15)])
    rows = [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in got.collect()
    ]
    exp = _run_ir(spark, qs_index, parse_query_string(q), 15)
    assert rows == [(7, *e) for e in exp]
    assert rows, "test premise: the query matches something"


def test_execute_occur_modifiers_and_fuzzy(spark, corpus, qs_index):
    a, b, c, d = _terms(corpus)
    q = f"+{a} {b}~ -{c}"
    got = [
        (r["rank"], r["doc_id"], r["score"])
        for r in query_string_topk_batch(
            spark, qs_index, [(0, q, 12)]
        ).collect()
    ]
    exp = _run_ir(spark, qs_index, parse_query_string(q), 12)
    assert got == exp and got


def test_execute_batch_keeps_query_ids(spark, corpus, qs_index):
    a, b, c, d = _terms(corpus)
    got = query_string_topk_batch(
        spark, qs_index, [(42, f"{a} AND {b}", 5), (3, f"{c} OR {d}", 5)]
    ).collect()
    ids = {r["query_id"] for r in got}
    assert ids == {42, 3}
    for qid, q in ((42, f"{a} AND {b}"), (3, f"{c} OR {d}")):
        sub = [
            (r["rank"], r["doc_id"], r["score"])
            for r in got
            if r["query_id"] == qid
        ]
        assert sorted(sub) == sorted(
            _run_ir(spark, qs_index, parse_query_string(q), 5)
        )


def test_execute_rejects_field_on_single_field_index(spark, qs_index):
    with pytest.raises(QueryStringError, match="multi-field"):
        query_string_topk_batch(spark, qs_index, [(0, "title:x", 5)])


# ---------------------------------------------------------------------------
# CLI surface
# ---------------------------------------------------------------------------


def test_cli_query_string_mode(spark, corpus, qs_index, capsys):
    from sparkfts.cli import main

    a, b, c, _ = _terms(corpus)
    main(["query", "--index", qs_index, "--query",
          f"{a} AND ({b} OR {c})", "--syntax", "query_string", "--k", "3"])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3
    import json as _json

    first = _json.loads(out[0])
    assert first["rank"] == 1 and "url" in first
    exp = _run_ir(
        spark, qs_index,
        parse_query_string(f"{a} AND ({b} OR {c})"), 3,
    )
    assert [_json.loads(l)["doc_id"] for l in out] == [e[1] for e in exp]


def test_cli_query_string_rejects_dsl_flags(qs_index):
    import pytest as _pytest

    from sparkfts.cli import main

    for flags, frag in (
        (["--fuzzy"], "--fuzzy"),
        (["--phrase"], "--phrase"),
        (["--filter", "lang='en'"], "--filter"),
        (["--offset", "5"], "--offset"),
    ):
        with _pytest.raises(SystemExit, match=frag.replace("-", ".")):
            main(["query", "--index", qs_index, "--query", "x",
                  "--syntax", "query_string", *flags])
