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


# -- Stemming ----------------------------------------------------------------
#
# Classic Porter stemmer (M.F. Porter, "An algorithm for suffix
# stripping", Program 14(3), 1980) — the ES ``stemmer: porter`` token
# filter. Implemented from the published rule tables (no third-party
# stemmer exists in this environment, and DuckDB's ``stem()`` lives in
# the unloadable fts extension), so THIS implementation is the pinned
# spec shared by engine and oracle — parity by construction, like the
# rest of the analyzer contract. Words of length <= 2 pass through
# unchanged (the canonical implementation's guard).


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in "aeiou":
        return False
    if c == "y":
        # y preceded by a consonant is a vowel; at the start or after a
        # vowel it is a consonant
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: the number of vowel->consonant transitions."""
    n, i, ln = 0, 0, len(stem)
    while i < ln and _is_cons(stem, i):
        i += 1
    while True:
        while i < ln and not _is_cons(stem, i):
            i += 1
        if i >= ln:
            return n
        n += 1
        while i < ln and _is_cons(stem, i):
            i += 1


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (
        len(w) >= 2
        and w[-1] == w[-2]
        and _is_cons(w, len(w) - 1)
    )


def _ends_cvc(w: str) -> bool:
    """*o: stem ends consonant-vowel-consonant, final cons not w/x/y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


# (suffix, replacement) tables; within a step the LONGEST matching
# suffix wins and ONLY its rule is considered (Porter's matching pin).
_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def _longest_rule(w: str, table) -> tuple[str, str] | None:
    best = None
    for suf, rep in table:
        if w.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


def porter_stem(word: str) -> str:
    """Porter-stem one lowercase token (pure; the pinned ``porter``
    stemmer option of :func:`tokenize`)."""
    w = word
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        stem = None
        if w.endswith("ed") and _has_vowel(w[:-2]):
            stem = w[:-2]
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            stem = w[:-3]
        if stem is not None:
            w = stem
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w = w + "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    rule = _longest_rule(w, _STEP2)
    if rule is not None:
        suf, rep = rule
        if _measure(w[: -len(suf)]) > 0:
            w = w[: -len(suf)] + rep
    # step 3
    rule = _longest_rule(w, _STEP3)
    if rule is not None:
        suf, rep = rule
        if _measure(w[: -len(suf)]) > 0:
            w = w[: -len(suf)] + rep
    # step 4
    best = None
    for suf in _STEP4:
        if w.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    if best is not None:
        stem = w[: -len(best)]
        if _measure(stem) > 1 and (
            best != "ion" or (stem and stem[-1] in "st")
        ):
            w = stem
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


_STEMMERS = {"porter": porter_stem}

# ES asciifolding's non-decomposable Latin mappings (NFKD handles the
# accent-stripping cases; these have no combining-mark decomposition)
_FOLD_MAP = str.maketrans(
    {
        "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE", "ø": "o", "Ø": "O",
        "ß": "ss", "ð": "d", "Ð": "D", "þ": "th", "Þ": "TH",
        "đ": "d", "Đ": "D", "ł": "l", "Ł": "L", "ı": "i",
    }
)


def ascii_fold(text: str) -> str:
    """ES ``asciifolding``: fold Latin-script letters to their ASCII
    equivalents (café -> cafe, Müller -> Muller, øre -> ore). Pinned as
    the special-case map above + NFKD decomposition with combining
    marks dropped; characters with no ASCII equivalent pass through
    (the tokenizer's ``[a-z0-9]+`` then treats them as separators,
    unchanged from the unfolded behavior)."""
    import unicodedata

    folded = unicodedata.normalize("NFKD", text.translate(_FOLD_MAP))
    return "".join(c for c in folded if not unicodedata.combining(c))


def _parse_syn_rules(spec: str) -> dict[str, str]:
    """``"lhs=rhs,lhs2=rhs2"`` -> contraction map. Pinned subset of
    ES's index-time ``synonym`` filter: explicit single-token
    contractions (``a => b``), applied ONCE after stemming.  With a
    stemmer in the chain, write rules against the POST-STEM stream
    (``televis=tv`` for "television" under porter) — stemmed forms are
    what the filter sees; stem-closure can't be validated because the
    classic Porter map isn't idempotent.  Fails loudly on: non-token
    sides, identity rules, duplicate lhs, and a rhs that is also a lhs
    (would make application order-dependent)."""
    rules: dict[str, str] = {}
    for rule in spec.split(","):
        lhs, sep, rhs = rule.partition("=")
        if not sep:
            raise ValueError(f"synonym rule {rule!r} must be 'lhs=rhs'")
        for side in (lhs, rhs):
            if TOKEN_RE.fullmatch(side) is None:
                raise ValueError(
                    f"synonym side {side!r} is not a single analyzer "
                    "token ([a-z0-9]+); multi-token synonyms are outside "
                    "the pinned subset"
                )
        if lhs == rhs:
            raise ValueError(f"identity synonym rule {rule!r}")
        if lhs in rules:
            raise ValueError(f"duplicate synonym lhs {lhs!r}")
        rules[lhs] = rhs
    if set(rules) & set(rules.values()):
        both = sorted(set(rules) & set(rules.values()))
        raise ValueError(
            f"synonym terms {both} appear as both lhs and rhs — rules "
            "apply exactly once (no chaining); collapse them first"
        )
    return rules


def _parse_chain(
    stemmer: str | None,
) -> tuple[bool, str | None, dict[str, str] | None]:
    """The ``stemmer`` meta slot carries the whole optional analysis
    chain: ``"porter"``, ``"asciifold"``, ``"syn:colour=color,..."``
    or any ``+``-combination (e.g. ``"asciifold+porter+syn:..."``).
    -> (fold?, stemmer-name-or-None, synonym-map-or-None); unknown
    parts fail loudly.  Riding the single meta slot means every
    existing consumer — index build, positions kernel, every query
    path, streamed appends, the warm Searcher — inherits folding,
    stemming AND index-time synonyms with zero extra plumbing."""
    if not stemmer:
        return False, None, None
    parts = stemmer.split("+")
    fold = "asciifold" in parts
    syn_specs = [p[len("syn:"):] for p in parts if p.startswith("syn:")]
    if len(syn_specs) > 1:
        raise ValueError(f"multiple syn: parts in chain {stemmer!r}")
    rest = [
        p for p in parts if p != "asciifold" and not p.startswith("syn:")
    ]
    if len(rest) > 1 or (rest and rest[0] not in _STEMMERS):
        raise ValueError(
            f"unknown analysis chain {stemmer!r}; options: "
            f"{sorted(_STEMMERS)}, 'asciifold', 'syn:<lhs=rhs,...>' and "
            "'+'-combinations"
        )
    name = rest[0] if rest else None
    syn = _parse_syn_rules(syn_specs[0]) if syn_specs else None
    return fold, name, syn


def synonym_chain(
    rules: dict[str, str], stemmer: str | None = None
) -> str:
    """Canonical chain string for index-time synonyms: appends a
    deterministic (lhs-sorted) ``syn:`` part to an optional base chain
    — pass the result as ``build_index(stemmer=...)``. Validates via
    :func:`_parse_chain` before returning."""
    if not rules:
        raise ValueError("empty synonym rules")
    spec = "syn:" + ",".join(
        f"{lhs}={rules[lhs]}" for lhs in sorted(rules)
    )
    chain = f"{stemmer}+{spec}" if stemmer else spec
    _parse_chain(chain)  # fail loud before any job runs
    return chain


# -- Index-time token expanders (edge_ngram / shingle) ------------------------
#
# ES's autocomplete / substring recipe: a dedicated subfield whose INDEX
# analyzer multiplies tokens (edge n-grams or word shingles) while the
# SEARCH analyzer stays standard — a user typing "spar" hits the indexed
# gram "spar" directly. Because the expansion applies only at index
# time, it cannot ride the `stemmer` chain slot (which every query path
# re-applies); it is a separate `expander` meta slot consumed by the
# index-side kernels only (sparkfts.tokens, sparkfts.index,
# sparkfts.streaming inherit it; query analysis never sees it).
#
# Pinned semantics (deterministic, oracle-expressible in DuckDB):
#  - ``edge:MIN-MAX``: per token, prefixes of length MIN..min(len, MAX);
#    a token longer than MAX also emits itself (exact matches always
#    work); a token shorter than MIN emits itself unchanged (stays
#    searchable — ES drops it, pinned deviation for usability).
#  - ``shingle:MIN-MAX``: original unigrams (ES output_unigrams=true)
#    plus concatenated shingles of window sizes MIN..MAX. ES joins
#    shingles with a space; the pinned joiner here is "" so every
#    emitted term is a single analyzer token ([a-z0-9]+) — same
#    semantics, different term surface (documented deviation).
#
# Doclen counts the EXPANDED stream (no Lucene discountOverlaps):
# this makes "expander index == plain index over pre-expanded text"
# an exact equivalence, which is the testable pin.


def _parse_expander(expander: str | None) -> tuple[str, int, int] | None:
    """``"edge:1-15"`` / ``"shingle:2-3"`` -> (kind, lo, hi); fail loud."""
    if not expander:
        return None
    m = re.fullmatch(r"(edge|shingle):(\d+)-(\d+)", expander)
    if m is None:
        raise ValueError(
            f"unknown expander {expander!r}; options: 'edge:MIN-MAX', "
            "'shingle:MIN-MAX'"
        )
    kind, lo, hi = m.group(1), int(m.group(2)), int(m.group(3))
    if lo < 1 or hi < lo:
        raise ValueError(f"expander bounds must satisfy 1 <= MIN <= MAX: "
                         f"{expander!r}")
    if kind == "shingle" and lo < 2:
        raise ValueError("shingle MIN must be >= 2 (unigrams are always "
                         "emitted)")
    return kind, lo, hi


def expand_tokens(toks: list[str], expander: str | None) -> list[str]:
    """Apply the pinned index-time expander to one analyzed token
    stream (identity when ``expander`` is None)."""
    spec = _parse_expander(expander)
    if spec is None:
        return list(toks)
    kind, lo, hi = spec
    out: list[str] = []
    if kind == "edge":
        for t in toks:
            n = len(t)
            if n < lo:
                out.append(t)
                continue
            for g in range(lo, min(n, hi) + 1):
                out.append(t[:g])
            if n > hi:
                out.append(t)
    else:  # shingle
        out.extend(toks)
        for size in range(lo, hi + 1):
            for i in range(len(toks) - size + 1):
                out.append("".join(toks[i:i + size]))
    return out


def stem_fn(stemmer: str | None):
    """Resolve the token-level step of the chain (``None``/fold-only ->
    None). Folding itself is a CHAR filter applied before tokenization
    (see :func:`tokenize`) — ES's asciifolding is a token filter, but
    this engine's ASCII tokenizer would split accented words before a
    token filter could fold them, so the pre-tokenize placement is
    what makes the two analyzers equivalent (pinned).

    With a ``syn:`` part in the chain the returned function is the
    COMPOSITION stem-then-contract (ES analyzer-chain order: synonym
    filter after the stemmer), so every token-level consumer applies
    index-time synonyms for free."""
    _fold, name, syn = _parse_chain(stemmer)
    base = _STEMMERS[name] if name else None
    if syn is None:
        return base
    if base is None:
        return lambda t, _s=syn: _s.get(t, t)

    def _composed(t, _b=base, _s=syn):
        t = _b(t)
        return _s.get(t, t)

    return _composed


# -- Tokenization ------------------------------------------------------------


def tokenize(text: str, stopwords=None, stemmer: str | None = None) -> list[str]:
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

    ``stemmer`` (OFF by default): pinned stemming applied AFTER the stop
    filter (the ES analyzer-chain order). ``"porter"`` =
    :func:`porter_stem`. The SAME option must apply at query analysis
    (read back from the index meta, like stopwords).
    """
    fold = _parse_chain(stemmer)[0]
    if fold:
        text = ascii_fold(text)
    toks = TOKEN_RE.findall(text.lower())
    if stopwords:
        sw = stopwords if isinstance(stopwords, (set, frozenset)) else set(
            stopwords
        )
        toks = [t for t in toks if t not in sw]
    fn = stem_fn(stemmer)
    if fn is not None:
        toks = [fn(t) for t in toks]
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


def tokenize_query(
    query: str, stopwords=None, stemmer: str | None = None
) -> list[str]:
    """Query-side analysis: tokenize, dedupe, sort.

    Conjunctive (``operator: "and"`` + ``bool.must``,
    reference ElasticsearchToNeo4jSync.py:96,102) semantics treat the query
    as a *set* of required terms; we pin deduplication and sorted order so
    BM25 summation order is deterministic (SURVEY.md §7.3). With a
    ``stopwords`` list, stopword query terms drop (ES: removed at
    analysis, so an AND query over "the spark" requires only "spark").
    ``stemmer`` applies the index's pinned stemmer to query terms (two
    surface forms stemming alike collapse to ONE required term).
    """
    return sorted(set(tokenize(query, stopwords, stemmer)))


def analysis_opts(meta: dict) -> tuple[frozenset | None, str | None]:
    """Index meta -> (stopwords, stemmer) for query-side analysis."""
    sw = frozenset(meta.get("stopwords") or []) or None
    return sw, (meta.get("stemmer") or None)
