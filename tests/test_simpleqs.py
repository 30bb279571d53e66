"""simple_query_string (sparkfts.simpleqs).

Pins: (a) the lenient parser's discard matrix — NOTHING in query text
raises; (b) flag gating (a disabled feature's character is literal);
(c) the fast path (phrase-free -> single-pass bool-tree kernel) and
the composed path (phrase-bearing -> leaf match sets + Catalyst fold)
are bit-identical on trees both can run; (d) Prefix bool-tree leaves
score identically to the standalone prefix query; (e) phrase-bearing
end-to-end results against a brute-force python mirror; (f) pure
negative / empty queries match nothing."""

from __future__ import annotations

import numpy as np
import pytest

from sparkfts.analysis import tokenize
from sparkfts.querybuilder import Bool, Clause, Prefix
from sparkfts.simpleqs import (
    PhraseLeaf,
    parse_simple_query_string,
    simple_query_string_topk_batch,
)


@pytest.fixture(scope="module")
def sqs_index(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index
    from sparkfts.phrase import build_positions

    d = str(tmp_path_factory.mktemp("sqs_idx"))
    pages = spark.createDataFrame(corpus.to_pandas())
    build_index(pages, d, n_shards=4, n_tbuckets=8)
    build_positions(pages, d)
    return d


def _terms(corpus):
    """Three reasonably common corpus terms."""
    from collections import Counter

    cnt = Counter(
        t
        for x in corpus.column("text").to_pylist()[:100]
        for t in tokenize(x)
    )
    common = [t for t, _ in cnt.most_common(40) if len(t) >= 3]
    return common[0], common[1], common[2]


# ---------------------------------------------------------------------------
# parser


def test_parse_default_operator():
    t = parse_simple_query_string("a b", "or")
    assert isinstance(t, Bool) and len(t.should) == 2 and not t.must
    t = parse_simple_query_string("a b", "and")
    assert isinstance(t, Bool) and len(t.must) == 2 and not t.should


def test_parse_precedence_and_binds_tighter():
    # a + b | c  ==  (a AND b) OR c
    t = parse_simple_query_string("a + b | c")
    assert isinstance(t, Bool) and len(t.should) == 2
    inner = t.should[0]
    assert isinstance(inner, Bool) and len(inner.must) == 2
    assert isinstance(t.should[1], Clause)


def test_parse_negation_levels():
    t = parse_simple_query_string("a -b")
    assert len(t.should) == 1 and len(t.must_not) == 1
    # mid-word '-' is term text (the querystring.py hyphen pin)
    t = parse_simple_query_string("a-b")
    assert isinstance(t, Clause) and t.query == "a-b"
    # double negation cancels
    t = parse_simple_query_string("--a b")
    assert isinstance(t, Bool) and len(t.should) == 2 and not t.must_not


def test_parse_phrase_prefix_fuzzy():
    t = parse_simple_query_string('"x y"~3 | a* | b~ | c~0')
    ph, pf, fz, ex = t.should
    assert ph == PhraseLeaf(text="x y", slop=3)
    assert isinstance(pf, Prefix) and pf.prefix == "a"
    assert isinstance(fz, Clause) and fz.fuzziness == "AUTO"
    assert isinstance(ex, Clause) and ex.fuzziness == "0"


def test_parse_leniency_matrix():
    """The ES 'discards invalid parts' contract: no query text raises."""
    cases = {
        "((( a": Clause,             # unclosed parens
        ") a )": Clause,             # stray closers
        '"unclosed a': PhraseLeaf,   # unclosed quote runs to EOF
        "a | | b": Bool,             # doubled operator
        "+ a": Clause,               # leading operator
        "a +": Clause,               # trailing operator
        "--": type(None),            # operators only
        "": type(None),
        "   ": type(None),
        "-a": type(None),            # pure negative matches nothing
        "*": type(None),             # bare star dropped
        "~2": type(None),            # dangling fuzziness
        '""': type(None),            # empty phrase
    }
    for q, want in cases.items():
        got = parse_simple_query_string(q)
        assert isinstance(got, want), (q, got)


def test_parse_flag_gating():
    # NONE: every special char is literal text
    t = parse_simple_query_string('a + "b c" -d', flags="NONE")
    assert isinstance(t, Bool)
    kinds = {type(c) for c in t.should}
    assert kinds == {Clause} and not t.must_not
    texts = [c.query for c in t.should]
    assert '"b' in texts and "-d" in texts
    # only NOT: '-' works, quotes/plus literal
    t = parse_simple_query_string('+a -b "c d"', flags=["NOT"])
    assert len(t.must_not) == 1 and t.must_not[0].query == "b"
    assert all(isinstance(c, Clause) for c in t.should)
    # SLOP is an alias of NEAR
    t = parse_simple_query_string('"a b"~2', flags=["PHRASE", "SLOP"])
    assert t == PhraseLeaf(text="a b", slop=2)
    with pytest.raises(ValueError):
        parse_simple_query_string("a", flags=["BOGUS"])
    with pytest.raises(ValueError):
        parse_simple_query_string("a", default_operator="xor")


def test_parse_escape():
    t = parse_simple_query_string(r"\+a \"b", flags="ALL")
    assert isinstance(t, Bool)
    assert [c.query for c in t.should] == ["+a", '"b']


# ---------------------------------------------------------------------------
# execution


def test_fast_equals_composed(spark, corpus, sqs_index):
    """Phrase-free trees: single-pass kernel and composed fold are
    bit-identical (same leaf kernels, same float64 sum order)."""
    t1, t2, t3 = _terms(corpus)
    for q, op in [
        (f"{t1} + {t2} | {t3}", "or"),
        (f"{t1} {t2} -{t3}", "or"),
        (f"{t1} {t2}", "and"),
        (f"({t1} | {t2}) + {t3}~", "or"),
        (f"{t1[:3]}* | {t2}", "or"),
    ]:
        a = simple_query_string_topk_batch(
            spark, sqs_index, [(0, q, 15)], default_operator=op
        ).collect()
        b = simple_query_string_topk_batch(
            spark, sqs_index, [(0, q, 15)], default_operator=op,
            _force_composed=True,
        ).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], q
        assert len(a) > 0, q


def test_prefix_leaf_matches_standalone_prefix(spark, corpus, sqs_index):
    """A bool-tree Prefix leaf == sparkfts.prefix.prefix_topk_batch."""
    from sparkfts.booltree import bool_topk_batch
    from sparkfts.prefix import prefix_topk_batch
    from sparkfts.querybuilder import SearchRequest

    t1, _, _ = _terms(corpus)
    pfx = t1[:2]
    a = prefix_topk_batch(spark, sqs_index, [(0, pfx, 20)]).collect()
    b = bool_topk_batch(
        spark, sqs_index,
        [SearchRequest(clauses=(Prefix(prefix=pfx),), k=20)],
    ).collect()
    assert [tuple(r)[1:] for r in a] == [tuple(r)[1:] for r in b]
    assert len(a) > 0


def test_phrase_composed_vs_python_mirror(spark, corpus, sqs_index):
    """'"p0 p1" | (t1 + t2) -t3' against a brute-force mirror built on
    the oracle scoring pins."""
    from sparkfts.stats import idf as idf_fn

    from sparkfts.tokens import prepare_pages

    prepared = prepare_pages(
        spark.createDataFrame(corpus.to_pandas())
    ).select("doc_id", "text").collect()
    toks = {r["doc_id"]: tokenize(r["text"]) for r in prepared}
    n_docs = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n_docs

    # pick an adjacent bigram that occurs in >= 3 docs
    from collections import Counter

    big = Counter()
    for tk in toks.values():
        for x, y in set(zip(tk, tk[1:])):
            big[(x, y)] += 1
    (p0, p1), dfp = max(big.items(), key=lambda kv: (kv[1], kv[0]))
    assert dfp >= 3
    t1, t2, t3 = _terms(corpus)

    q = f'"{p0} {p1}" | ({t1} + {t2}) -{t3}'
    got = simple_query_string_topk_batch(
        spark, sqs_index, [(0, q, 10)]
    ).collect()

    # mirror
    df = Counter()
    for tk in toks.values():
        for t in set(tk):
            df[t] += 1

    def bm25(term, tk):
        tf = tk.count(term)
        if tf == 0:
            return None
        dl = len(tk)
        idf = idf_fn(n_docs, df[term])
        return idf * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) * 2.2

    idf_sum = idf_fn(n_docs, df[p0]) + idf_fn(n_docs, df[p1])
    expect = []
    for d, tk in toks.items():
        # phrase leaf score (exact adjacency, oracle.phrase pin)
        tfp = sum(
            1 for i in range(len(tk) - 1) if tk[i] == p0 and tk[i + 1] == p1
        )
        sp = (
            idf_sum
            * (tfp / (tfp + 1.2 * (1 - 0.75 + 0.75 * len(tk) / avgdl)))
            * 2.2
            if tfp
            else None
        )
        s1, s2, s3 = bm25(t1, tk), bm25(t2, tk), bm25(t3, tk)
        matched = (sp is not None) or (s1 is not None and s2 is not None)
        if s3 is not None or not matched:
            continue
        score = (sp or 0.0) + (
            (s1 + s2) if (s1 is not None and s2 is not None) else 0.0
        )
        expect.append((d, score))
    assert expect, "mirror produced no matches — test corpus drifted"
    expect.sort(key=lambda x: (-x[1], x[0]))
    expect = expect[:10]
    got_t = [(r["doc_id"], r["score"]) for r in got]
    assert [d for d, _ in got_t] == [d for d, _ in expect]
    assert np.allclose(
        [s for _, s in got_t], [s for _, s in expect], rtol=0, atol=1e-9
    )


def test_matches_nothing_cases(spark, corpus, sqs_index):
    t1, _, _ = _terms(corpus)
    for q in ["", "-" + t1, "+ | -", '""', "~2"]:
        rows = simple_query_string_topk_batch(
            spark, sqs_index, [(0, q, 5)]
        ).collect()
        assert rows == [], q


def test_garbage_never_raises(spark, corpus, sqs_index):
    for q in [")(", '"', "~~~", "+-|", "  -  ", "(()", "x|(-y)",
              "\\", "a\\", '*"*"*', "((((((((("]:
        simple_query_string_topk_batch(
            spark, sqs_index, [(0, q, 5)]
        ).collect()  # must not raise


def test_multifield_phrase_rejected(spark, corpus, sqs_index):
    with pytest.raises(ValueError, match="single-field"):
        simple_query_string_topk_batch(
            spark, sqs_index, [(0, '"a b"', 5)], multifield=True
        )


# ---------------------------------------------------------------------------
# CLI


def test_cli_simple_query_string(spark, corpus, sqs_index, capsys):
    import json

    from sparkfts.cli import main

    t1, t2, _ = _terms(corpus)
    q = f"{t1} + {t2}"
    main(["query", "--index", sqs_index, "--query", q,
          "--syntax", "simple_query_string", "--k", "5", "--cores", "4"])
    rows = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line and "rank" in line
    ]
    rows = [r for r in rows if "rank" in r]
    want = simple_query_string_topk_batch(
        spark, sqs_index, [(0, q, 5)]
    ).collect()
    assert [(r["rank"], r["doc_id"]) for r in rows] == [
        (r["rank"], r["doc_id"]) for r in want
    ]
    assert len(rows) == 5


def test_cli_simple_qs_flags_and_guards(spark, corpus, sqs_index, capsys):
    from sparkfts.cli import main

    t1, _, _ = _terms(corpus)
    # NONE flags: operators are literal -> still runs, never raises
    main(["query", "--index", sqs_index, "--query", f"+{t1} -x",
          "--syntax", "simple_query_string", "--flags", "NONE",
          "--k", "3", "--cores", "4"])
    capsys.readouterr()
    # incompatible explicit flags fail loud BEFORE Spark spins up
    with pytest.raises(SystemExit, match="simple_query_string"):
        main(["query", "--index", sqs_index, "--query", t1,
              "--syntax", "simple_query_string", "--phrase",
              "--k", "3", "--cores", "4"])
