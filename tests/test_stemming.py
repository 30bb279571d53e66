"""Index-time Porter stemming (sparkfts.analysis.porter_stem + the
``stemmer="porter"`` build option).

The pinned spec is the classic Porter algorithm (Porter 1980) —
implemented once in sparkfts.analysis and shared by the engine's Arrow
kernels and the python oracle, so parity holds by construction (the
same contract as stopwords; no SQL oracle exists because DuckDB's
``stem()`` lives in an unloadable extension here).

Equivalence trick used throughout: stemming at index time over raw text
is EXACTLY a default-analyzer index over pre-stemmed text (stems stay
inside [a-z0-9]+), so every existing oracle applies unchanged to the
pre-stemmed corpus.
"""

from __future__ import annotations

import pytest

from oracle.bm25 import BM25Oracle
from sparkfts.analysis import porter_stem, tokenize, tokenize_query
from sparkfts.index import build_index
from sparkfts.synth import gen_corpus
from sparkfts.tokens import sha1_doc_id

PORTER_CASES = {
    # step 1a / 1b / 1c
    "caresses": "caress", "ponies": "poni", "cats": "cat", "feed": "feed",
    "agreed": "agre", "plastered": "plaster", "motoring": "motor",
    "conflated": "conflat", "sized": "size", "hopping": "hop",
    "falling": "fall", "hissing": "hiss", "filing": "file",
    "happy": "happi", "sky": "sky",
    # steps 2-4
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "digitizer": "digit", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "formaliti": "formal",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "adjustable": "adjust", "defensible": "defens",
    "replacement": "replac", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "effective": "effect", "angulariti": "angular",
    # step 5 + full-pipeline classics
    "probate": "probat", "rate": "rate", "cease": "ceas", "roll": "roll",
    "agreement": "agreement", "university": "univers",
    "universities": "univers", "running": "run", "flies": "fli",
    "capabilities": "capabl", "responsiveness": "respons",
    "generalization": "gener", "oscillators": "oscil",
    "presumably": "presum", "argument": "argument", "maximum": "maximum",
}


def test_porter_table():
    for w, want in PORTER_CASES.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_porter_short_words_unchanged():
    for w in ["a", "is", "by", "s", ""]:
        assert porter_stem(w) == w


def test_tokenize_chain_order():
    """stop filter BEFORE stemming: a stopword is dropped by surface
    form, not by stem."""
    out = tokenize("the running dogs", stopwords={"the"}, stemmer="porter")
    assert out == ["run", "dog"]
    # a stopword list entry never removes a merely stem-equal token
    out2 = tokenize("runs running", stopwords={"run"}, stemmer="porter")
    assert out2 == ["run", "run"]


def test_unknown_stemmer_fails_loud(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown analysis chain"):
        build_index(
            spark.createDataFrame([("u", "t")], "url string, text string"),
            str(tmp_path / "x"),
            stemmer="snowball2",
        )


@pytest.fixture(scope="module")
def st_corpus():
    return gen_corpus(250, seed=77)


@pytest.fixture(scope="module")
def st_idx(spark, st_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stem") / "idx")
    build_index(
        spark.createDataFrame(st_corpus.to_pandas()), d, n_shards=4,
        n_tbuckets=8, stemmer="porter",
    )
    return d


@pytest.fixture(scope="module")
def st_oracle(st_corpus):
    pdf = st_corpus.to_pandas()
    ids = sha1_doc_id(pdf["url"])
    return BM25Oracle(
        zip(ids.tolist(), pdf["text"].tolist()), stemmer="porter"
    )


def _queries(st_oracle):
    """A few multi-term queries whose SURFACE forms stem non-trivially."""
    import random

    rng = random.Random(5)
    stems = sorted(
        t for t in st_oracle.postings
        if len(st_oracle.postings[t]) >= 5 and len(t) >= 4
    )
    qs = []
    for i in range(0, min(8, len(stems) - 1), 2):
        # query with -ing / -s surface forms that stem back
        a, b = stems[i], stems[rng.randrange(len(stems))]
        qs.append(f"{a}ing {b}s")
    return qs


def test_stemmed_index_matches_oracle(spark, st_idx, st_oracle):
    from sparkfts.query import bm25_index_batch

    got_any = False
    for q in _queries(st_oracle):
        exp = st_oracle.search(q, k=10)
        rows = bm25_index_batch(spark, st_idx, [(0, q, 10)]).collect()
        assert [r["doc_id"] for r in rows] == [d for d, _ in exp], q
        for r, (_, s) in zip(rows, exp):
            assert r["score"] == pytest.approx(s, rel=1e-9)
        got_any = got_any or bool(exp)
    assert got_any, "test premise: at least one query matches"


def test_stemmed_oracle_equals_prestemmed_default():
    """BM25Oracle(raw, stemmer) == BM25Oracle(pre-stemmed text): the
    equivalence every other oracle reuse in this file relies on."""
    texts = [
        "the cats are running quickly",
        "a cat ran and jumped over fences",
        "running runs runner",
    ]
    a = BM25Oracle(enumerate(texts), stemmer="porter")
    b = BM25Oracle(
        (i, " ".join(tokenize(t, None, "porter")))
        for i, t in enumerate(texts)
    )
    assert a.postings == b.postings
    assert a.doclen == b.doclen
    assert a.search("running", k=10) == b.search(
        " ".join(tokenize_query("running", None, "porter")), k=10
    )


def test_searcher_on_stemmed_index(spark, st_idx, st_oracle):
    """Warm serving analyzes with the index's stemmer (meta round-trip)."""
    from sparkfts.searcher import Searcher

    s = Searcher(spark, st_idx)
    q = _queries(st_oracle)[0]
    exp = st_oracle.search(q, k=10)
    got = s.search_rows([(0, q, 10)])
    assert [r[2] for r in got] == [d for d, _ in exp]
    for r, (_, sc) in zip(got, exp):
        assert r[3] == pytest.approx(sc, rel=1e-9)


def test_phrase_on_stemmed_index(spark, st_corpus, st_idx, tmp_path_factory):
    """Positions are numbered over the stemmed stream: a phrase of
    surface forms matches stem-adjacent docs, parity with the phrase
    oracle over the pre-stemmed corpus."""
    from oracle.phrase import PhraseOracle
    from sparkfts.phrase import build_positions, match_phrase_batch

    pdf = st_corpus.to_pandas()
    pages = (
        pdf.assign(
            text=[" ".join(tokenize(t, None, "porter")) for t in pdf["text"]]
        )
    )
    ids = sha1_doc_id(pdf["url"])
    po = PhraseOracle(zip(ids.tolist(), pages["text"].tolist()))
    # pick an adjacent stemmed bigram from the first doc
    toks = tokenize(pdf["text"].iloc[0], None, "porter")
    phrase = f"{toks[3]} {toks[4]}"
    build_positions(spark.createDataFrame(pdf), st_idx)
    exp = po.search(phrase, k=10)
    got = match_phrase_batch(spark, st_idx, [(0, phrase, 10)]).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-9)
