"""Index-time synonyms (round-4 VERDICT gap #2): the ``syn:`` chain part.

Pin: an index built with a synonym chain behaves byte-identically to an
index built over a corpus whose text was pre-contracted with the same
rules (the asciifold/stemming test device) — across the scan-free BM25
path, phrase positions, and the warm Searcher. Query-time expansion
(sparkfts/query.py synonyms=) is the OTHER direction and is unchanged.
"""

from __future__ import annotations

import pytest

from sparkfts.analysis import (
    _parse_chain,
    stem_fn,
    synonym_chain,
    tokenize,
)

RULES = {"colour": "color", "optimise": "optimize", "tv": "television"}
CHAIN = synonym_chain(RULES)


def _contract(text: str) -> str:
    out = []
    for w in text.split():
        out.append(RULES.get(w, w))
    return " ".join(out)


def test_chain_parse_and_tokenize_pins():
    assert _parse_chain(CHAIN) == (False, None, RULES)
    assert _parse_chain("asciifold+porter+syn:colour=color") == (
        True, "porter", {"colour": "color"},
    )
    fn = stem_fn(CHAIN)
    assert fn("colour") == "color"
    assert fn("other") == "other"
    # ES chain order: stemmer BEFORE synonym contraction
    fn2 = stem_fn("porter+syn:televis=tv")
    assert fn2("television") == "tv"  # televis(ion) -> televis -> tv
    assert tokenize("the colour tv", stemmer=CHAIN) == [
        "the", "color", "television",
    ]
    # rules apply to the post-stem stream: 'television' -> porter
    # 'televis' -> rule fires; a surface-form lhs never matches
    fn3 = stem_fn("porter+syn:television=tv")
    assert fn3("television") == "televis"  # rule written pre-stem: dead
    with pytest.raises(ValueError):
        synonym_chain({})


@pytest.fixture(scope="module")
def syn_pair(spark, tmp_path_factory):
    """Two indexes: raw corpus + syn chain VS pre-contracted corpus +
    no chain — must behave identically."""
    import pandas as pd

    from sparkfts.index import build_index

    rows = [
        ("https://s.ex/1", "the colour tv broadcast starts tonight"),
        ("https://s.ex/2", "color television is an old phrase now"),
        ("https://s.ex/3", "we optimise the colour pipeline daily"),
        ("https://s.ex/4", "unrelated text about spark partitions here"),
        ("https://s.ex/5", "colour colour colour repeated for tf weight"),
    ]
    pdf = pd.DataFrame(rows, columns=["url", "text"])
    base = tmp_path_factory.mktemp("syn")
    syn_idx = str(base / "syn")
    build_index(
        spark.createDataFrame(pdf), syn_idx, n_shards=2, n_tbuckets=4,
        stemmer=CHAIN,
    )
    pre = pdf.copy()
    pre["text"] = pre["text"].map(_contract)
    plain_idx = str(base / "plain")
    build_index(
        spark.createDataFrame(pre), plain_idx, n_shards=2, n_tbuckets=4
    )
    return syn_idx, plain_idx


def test_syn_index_rank_identical_to_precontracted(spark, syn_pair):
    from sparkfts.query import bm25_index_batch

    syn_idx, plain_idx = syn_pair
    for q in ("colour", "color", "tv", "television broadcast",
              "optimise pipeline", "spark"):
        a = bm25_index_batch(spark, syn_idx, [(0, q, 10)],
                             mode="or").collect()
        b = bm25_index_batch(spark, plain_idx, [(0, _contract(q), 10)],
                             mode="or").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], q
    # both surface forms of a query hit the SAME docs on the syn index
    a = bm25_index_batch(spark, syn_idx, [(0, "colour", 10)],
                         mode="or").collect()
    b = bm25_index_batch(spark, syn_idx, [(0, "color", 10)],
                         mode="or").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert {r["doc_id"] for r in a if True}  # docs 1, 2(, 3, 5)


def test_syn_positions_and_phrase(spark, tmp_path_factory):
    """The positions kernel runs the same chain: a phrase queried in
    canonical form matches docs written in the synonym form."""
    import pandas as pd

    from sparkfts.index import build_index
    from sparkfts.phrase import build_positions, match_phrase_batch

    rows = [
        ("https://p.ex/1", "the colour tv broadcast"),
        ("https://p.ex/2", "a color television broadcast"),
        ("https://p.ex/3", "television colour nothing adjacent"),
    ]
    pdf = pd.DataFrame(rows, columns=["url", "text"])
    idx = str(tmp_path_factory.mktemp("synph") / "idx")
    df = spark.createDataFrame(pdf)
    build_index(df, idx, n_shards=2, n_tbuckets=4, stemmer=CHAIN)
    build_positions(df, idx)  # chain read back from meta by contract
    got = match_phrase_batch(
        spark, idx, [(0, "color television broadcast", 10)]
    ).collect()
    assert len(got) == 2  # docs 1 and 2 both contain the analyzed phrase
    got2 = match_phrase_batch(
        spark, idx, [(0, "colour tv broadcast", 10)]
    ).collect()
    assert [tuple(r) for r in got2] == [tuple(r) for r in got]


def test_syn_meta_roundtrip_and_searcher(spark, syn_pair):
    from sparkfts.index import read_meta
    from sparkfts.searcher import Searcher

    syn_idx, _ = syn_pair
    assert read_meta(syn_idx)["stemmer"] == CHAIN
    s = Searcher(spark, syn_idx)
    rows_a = s.search_rows([(0, "colour", 10)], mode="or")
    rows_b = s.search_rows([(0, "color", 10)], mode="or")
    assert rows_a and rows_a == rows_b
    s.close()
