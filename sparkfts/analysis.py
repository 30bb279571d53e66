"""Pinned text analysis: HTML extraction + tokenization (pure, no Spark).

These two functions ARE the engine's analyzer contract. The same code is
imported by the pure-Python oracle (``oracle/bm25.py``) and wrapped in
Arrow-vectorized pandas UDFs on the Spark side (``sparkfts.tokens``), so
"byte-identical extracted text per url" and "rank-identical top-k" hold by
construction rather than by hope.

Reference parity: the reference lowercases the query string before search
(reference ElasticsearchToNeo4jSync.py:94) and otherwise delegates analysis
to Elasticsearch's standard analyzer (Unicode word split + lowercase),
pinned by the ``multi_match`` DSL it emits at
reference ElasticsearchToNeo4jSync.py:92-99. We pin the engine analyzer to
``lower() + [a-z0-9]+ word extraction`` — deterministic, locale-free, and
exactly expressible in DuckDB SQL (``regexp_extract_all(lower(t),
'[a-z0-9]+')``) for the driver's oracle harness.
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile(r"[a-z0-9]+")

# -- HTML extraction ---------------------------------------------------------

# Tags whose entire content is dropped (not rendered text).
_DROP_CONTENT_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")

# Minimal pinned entity table (hand-rolled: no dependence on stdlib
# html.unescape's version-varying entity database).
_NAMED_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": " ",
}
_ENTITY_RE = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z]+);")


def _decode_entity(m: re.Match) -> str:
    body = m.group(1)
    if body.startswith("#"):
        try:
            cp = int(body[2:], 16) if body[1] in "xX" else int(body[1:])
            if 0 < cp <= 0x10FFFF:
                return chr(cp)
        except ValueError:
            pass
        return m.group(0)
    return _NAMED_ENTITIES.get(body.lower(), m.group(0))


def extract_text(html: bytes | str) -> str:
    """Deterministic HTML -> visible-text extraction.

    Pipeline (pinned, order matters):
      1. UTF-8 decode (``errors='replace'``) if bytes.
      2. Strip comments, then <script>/<style> blocks including content.
      3. Replace every remaining tag with a single space (block/inline
         distinction collapsed — whitespace canonicalization subsumes it).
      4. Decode the pinned entity subset (named table above + numeric).
      5. Whitespace-canonicalize: ``' '.join(text.split())``.

    Pure function of the bytes: no locale, no wall clock, no third-party
    parser whose version could drift (SURVEY.md §7.3 "byte-identical
    extraction"). The synthetic corpus stores
    ``text == extract_text(html)`` at generation time, and the engine's
    pandas UDF wraps this same function, so the per-url byte-identity
    invariant of BASELINE.json ``input_hint`` is checkable exactly.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html
    s = _COMMENT_RE.sub(" ", s)
    s = _DROP_CONTENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _ENTITY_RE.sub(_decode_entity, s)
    return " ".join(s.split())


# -- Tokenization ------------------------------------------------------------


def tokenize(text: str, stopwords=None) -> list[str]:
    """Pinned analyzer: casefold via ``str.lower`` then ``[a-z0-9]+`` runs.

    Matches the reference's lowercase normalization
    (reference ElasticsearchToNeo4jSync.py:94) and stands in for the ES
    standard analyzer on ASCII-ish web text. Identical semantics in DuckDB:
    ``unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))``.

    ``stopwords`` (OFF by default — the oracle-contract analyzer takes
    none): an ES-style index-time stop filter. Pinned semantics follow
    Lucene's StopFilter as configured by ES's ``stop`` filter WITHOUT
    position increments preserved for scoring-length purposes: removed
    tokens do not count toward doclen, and (per the engine's positions
    pin) surviving tokens are re-numbered densely — phrase adjacency is
    over the surviving stream. The SAME list must be passed at query
    analysis (the engine reads it back from the index meta).
    """
    toks = TOKEN_RE.findall(text.lower())
    if stopwords:
        sw = stopwords if isinstance(stopwords, (set, frozenset)) else set(
            stopwords
        )
        toks = [t for t in toks if t not in sw]
    return toks


def auto_fuzz(term: str) -> int:
    """ES ``fuzziness: AUTO`` (AUTO:3,6) max edit distance by term length.

    The reference requests this in every search (reference
    ElasticsearchToNeo4jSync.py:97); pinned here so oracle and engine
    share one definition: len 0-2 -> 0, 3-5 -> 1, >=6 -> 2.
    """
    n = len(term)
    if n < 3:
        return 0
    if n < 6:
        return 1
    return 2


def tokenize_query(query: str, stopwords=None) -> list[str]:
    """Query-side analysis: tokenize, dedupe, sort.

    Conjunctive (``operator: "and"`` + ``bool.must``,
    reference ElasticsearchToNeo4jSync.py:96,102) semantics treat the query
    as a *set* of required terms; we pin deduplication and sorted order so
    BM25 summation order is deterministic (SURVEY.md §7.3). With a
    ``stopwords`` list, stopword query terms drop (ES: removed at
    analysis, so an AND query over "the spark" requires only "spark").
    """
    return sorted(set(tokenize(query, stopwords)))
