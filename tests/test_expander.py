"""Index-time edge_ngram / shingle expanders (round-4 VERDICT gap #3).

Pin: an expander index behaves byte-identically to a PLAIN index built
over pre-expanded text (the expansion literally defines the token
stream, doclen included), while query analysis stays standard — the ES
index-analyzer / search-analyzer split that serves autocomplete.
"""

from __future__ import annotations

import pytest

from sparkfts.analysis import _parse_expander, expand_tokens


def test_expander_parse_and_expand_pins():
    assert _parse_expander(None) is None
    assert _parse_expander("edge:1-15") == ("edge", 1, 15)
    assert _parse_expander("shingle:2-3") == ("shingle", 2, 3)
    for bad in ("edge:0-5", "edge:5-2", "gram:1-3", "edge:1", "shingle:1-2"):
        with pytest.raises(ValueError):
            _parse_expander(bad)
    assert expand_tokens(["spark"], "edge:2-4") == [
        "sp", "spa", "spar", "spark",  # grams 2..4 + full token (len>max)
    ]
    assert expand_tokens(["spark"], "edge:2-8") == [
        "sp", "spa", "spar", "spark",  # grams up to len, no dup full token
    ]
    assert expand_tokens(["a"], "edge:2-4") == ["a"]  # short: unchanged
    assert expand_tokens(["new", "york", "city"], "shingle:2-3") == [
        "new", "york", "city", "newyork", "yorkcity", "newyorkcity",
    ]
    assert expand_tokens([], "edge:1-3") == []


def _expand_text(text: str, expander: str) -> str:
    from sparkfts.analysis import TOKEN_RE

    return " ".join(expand_tokens(TOKEN_RE.findall(text.lower()), expander))


@pytest.fixture(scope="module")
def edge_pair(spark, tmp_path_factory):
    import pandas as pd

    from sparkfts.index import build_index

    rows = [
        ("https://e.ex/1", "spark partition shuffle strategy"),
        ("https://e.ex/2", "sparse vectors sparkle in spring"),
        ("https://e.ex/3", "unrelated words entirely here now"),
        ("https://e.ex/4", "spark spark spark repeated often"),
    ]
    pdf = pd.DataFrame(rows, columns=["url", "text"])
    base = tmp_path_factory.mktemp("edge")
    edge_idx = str(base / "edge")
    build_index(
        spark.createDataFrame(pdf), edge_idx, n_shards=2, n_tbuckets=4,
        expander="edge:2-10",
    )
    pre = pdf.copy()
    pre["text"] = pre["text"].map(lambda t: _expand_text(t, "edge:2-10"))
    plain_idx = str(base / "plain")
    build_index(
        spark.createDataFrame(pre), plain_idx, n_shards=2, n_tbuckets=4
    )
    return edge_idx, plain_idx


def test_edge_index_rank_identical_to_preexpanded(spark, edge_pair):
    from sparkfts.query import bm25_index_batch

    edge_idx, plain_idx = edge_pair
    for q in ("sp", "spar", "spark", "shuffle", "spr"):
        a = bm25_index_batch(spark, edge_idx, [(0, q, 10)],
                             mode="or").collect()
        b = bm25_index_batch(spark, plain_idx, [(0, q, 10)],
                             mode="or").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], q
    # autocomplete: the typed prefix (standard-analyzed) matches docs
    # containing any word with that prefix
    got = bm25_index_batch(spark, edge_idx, [(0, "spar", 10)],
                           mode="or").collect()
    assert {r["doc_id"] for r in got} == {
        r["doc_id"]
        for r in bm25_index_batch(spark, edge_idx, [(0, "sp", 10)],
                                  mode="or").collect()
    } or len(got) >= 3  # docs 1, 2, 4 all contain spar* words


def test_edge_meta_guards_and_streaming(spark, edge_pair, tmp_path_factory):
    import pandas as pd

    from sparkfts.index import build_index, read_meta
    from sparkfts.phrase import build_positions
    from sparkfts.query import bm25_index_batch
    from sparkfts.streaming import ingest_batch

    edge_idx, _ = edge_pair
    assert read_meta(edge_idx)["expander"] == "edge:2-10"
    df = spark.createDataFrame(
        pd.DataFrame([("https://e.ex/x", "x")], columns=["url", "text"])
    )
    with pytest.raises(ValueError, match="positions"):
        build_positions(df, edge_idx)
    with pytest.raises(ValueError, match="default analyzer"):
        build_index(df, str(tmp_path_factory.mktemp("bad") / "i"),
                    expander="edge:1-5", stemmer="porter")
    # streamed appends inherit the expander from root meta
    app = spark.createDataFrame(
        pd.DataFrame([("https://e.ex/5", "sparta rises again")],
                     columns=["url", "text"])
    )
    ingest_batch(app, 0, edge_idx, n_shards=2, n_tbuckets=4)
    got = bm25_index_batch(spark, edge_idx, [(0, "spart", 10)],
                           mode="or").collect()
    assert len(got) == 1  # only the streamed doc has the 'spart' gram


def test_shingle_index_matches_concatenated_phrase(spark, tmp_path_factory):
    import pandas as pd

    from sparkfts.index import build_index
    from sparkfts.query import bm25_index_batch

    rows = [
        ("https://sh.ex/1", "new york city weather today"),
        ("https://sh.ex/2", "york is a city in england"),
        ("https://sh.ex/3", "new houses in the city"),
    ]
    pdf = pd.DataFrame(rows, columns=["url", "text"])
    idx = str(tmp_path_factory.mktemp("shingle") / "idx")
    build_index(spark.createDataFrame(pdf), idx, n_shards=2, n_tbuckets=4,
                expander="shingle:2-2")
    # the concatenated shingle matches ONLY the doc with the adjacency
    got = bm25_index_batch(spark, idx, [(0, "newyork", 10)],
                           mode="or").collect()
    assert len(got) == 1
    # unigrams still searchable (output_unigrams=true)
    uni = bm25_index_batch(spark, idx, [(0, "city", 10)],
                           mode="or").collect()
    assert len(uni) == 3


def test_search_as_you_type_equivalence(spark, tmp_path_factory):
    """ES search_as_you_type, covered by composition (SURVEY §2.17):
    typing a prefix and running a PLAIN match on the edge_ngram index
    retrieves exactly the docs a prefix query retrieves on the
    standard index — the field type's ``_index_prefix`` subfield
    contract (match_bool_prefix on the standard index is the other
    half, tested in test_bool_prefix). Fresh index pair: the module
    fixture's edge index is mutated by the streaming test above."""
    import pandas as pd

    from sparkfts.index import build_index
    from sparkfts.prefix import prefix_topk_batch
    from sparkfts.query import bm25_index_batch

    rows = [
        ("https://e.ex/1", "spark partition shuffle strategy"),
        ("https://e.ex/2", "sparse vectors sparkle in spring"),
        ("https://e.ex/3", "unrelated words entirely here now"),
        ("https://e.ex/4", "spark spark spark repeated often"),
    ]
    base = tmp_path_factory.mktemp("sayt")
    pdf = pd.DataFrame(rows, columns=["url", "text"])
    orig_idx = str(base / "orig")
    build_index(
        spark.createDataFrame(pdf), orig_idx, n_shards=2, n_tbuckets=4
    )
    edge_idx = str(base / "edge")
    build_index(
        spark.createDataFrame(pdf), edge_idx, n_shards=2, n_tbuckets=4,
        expander="edge:2-10",
    )
    for p in ("sp", "spa", "spar", "spark", "shuf", "unrel", "ve"):
        sayt = {
            r["doc_id"]
            for r in bm25_index_batch(
                spark, edge_idx, [(0, p, 10)], mode="or"
            ).collect()
        }
        pref = {
            r["doc_id"]
            for r in prefix_topk_batch(
                spark, orig_idx, [(0, p, 10)]
            ).collect()
        }
        assert sayt == pref, p
    assert sayt  # the loop's last prefix ("ve") matches doc 2
