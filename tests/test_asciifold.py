"""asciifolding analysis chain: char-filter pin + build/query parity
via the pre-folded-corpus equivalence (the stemming test's device)."""

from __future__ import annotations

import pytest

from sparkfts.analysis import (
    _parse_chain,
    ascii_fold,
    stem_fn,
    tokenize,
)


def test_fold_pins():
    assert ascii_fold("café") == "cafe"
    assert ascii_fold("Müller-Lüdenscheidt") == "Muller-Ludenscheidt"
    assert ascii_fold("øre Æon straße") == "ore AEon strasse"
    assert ascii_fold("naïve þing łódź") == "naive thing lodz"
    assert ascii_fold("plain ascii 123") == "plain ascii 123"
    # no-ASCII-equivalent chars pass through (tokenizer splits on them)
    assert "中" in ascii_fold("中文")


def test_chain_parsing_and_tokenize():
    assert _parse_chain(None) == (False, None, None)
    assert _parse_chain("porter") == (False, "porter", None)
    assert _parse_chain("asciifold") == (True, None, None)
    assert _parse_chain("asciifold+porter") == (True, "porter", None)
    for bad in ("snowball", "asciifold+snowball", "porter+porter"):
        with pytest.raises(ValueError):
            _parse_chain(bad)
    assert stem_fn("asciifold") is None
    assert stem_fn("asciifold+porter")("running") == "run"
    # folding merges split tokens: naïve is 2 ASCII runs unfolded, 1 folded
    assert tokenize("naïve café") == ["na", "ve", "caf"]
    assert tokenize("naïve café", stemmer="asciifold") == ["naive", "cafe"]
    assert tokenize("Müller running", stemmer="asciifold+porter") == [
        "muller", "run",
    ]


@pytest.fixture(scope="module")
def folded_pair(spark, tmp_path_factory):
    """Two indexes: accented corpus + asciifold chain VS pre-folded
    corpus + no chain — must behave identically."""
    import pandas as pd

    from sparkfts.index import build_index

    rows = [
        ("https://a.ex/1", "le café naïve de Müller ouvre tôt"),
        ("https://a.ex/2", "the cafe naive of muller opens early"),
        ("https://a.ex/3", "completely unrelated søk text straße here"),
        ("https://a.ex/4", "café café café and more words follow"),
    ]
    pdf = pd.DataFrame(rows, columns=["url", "text"])
    base = tmp_path_factory.mktemp("fold")
    folded_idx = str(base / "folded")
    build_index(
        spark.createDataFrame(pdf), folded_idx, n_shards=2, n_tbuckets=4,
        stemmer="asciifold",
    )
    pre = pdf.copy()
    pre["text"] = pre["text"].map(ascii_fold)
    plain_idx = str(base / "plain")
    build_index(
        spark.createDataFrame(pre), plain_idx, n_shards=2, n_tbuckets=4
    )
    return folded_idx, plain_idx


def test_folded_index_rank_identical_to_prefolded(spark, folded_pair):
    from sparkfts.query import bm25_index_batch

    folded_idx, plain_idx = folded_pair
    for q in ("café", "cafe", "naïve muller", "straße", "strasse"):
        a = bm25_index_batch(
            spark, folded_idx, [(0, q, 10)], mode="or"
        ).collect()
        b = bm25_index_batch(
            spark, plain_idx, [(0, ascii_fold(q), 10)], mode="or"
        ).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], q
    # accented and plain forms of the query hit the SAME docs
    a = bm25_index_batch(spark, folded_idx, [(0, "café", 10)],
                         mode="or").collect()
    assert {r["doc_id"] for r in a} and len(a) >= 2  # docs 1, 2, 4


def test_folded_meta_roundtrip_and_searcher(spark, folded_pair):
    from sparkfts.index import read_meta
    from sparkfts.searcher import Searcher

    folded_idx, _ = folded_pair
    assert read_meta(folded_idx)["stemmer"] == "asciifold"
    s = Searcher(spark, folded_idx)
    rows = s.search_rows([(0, "Müller", 10)], mode="or")
    assert rows, "warm serving must analyze with the chain"
    s.close()
