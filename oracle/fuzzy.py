"""Pure-Python fuzzy-BM25 oracle — the executable spec for ``fuzziness: AUTO``.

The reference emits ``multi_match ... fuzziness: "AUTO"`` in every search
request (reference ElasticsearchToNeo4jSync.py:97) and delegates the
semantics to Elasticsearch/Lucene. We pin an explicit, deterministic,
SQL-expressible version of those semantics (SURVEY.md §2.7):

- **AUTO edit distance** (documented ES ``AUTO:3,6`` default):
  query terms of length 0-2 allow distance 0, length 3-5 allow 1,
  length >= 6 allow 2.
- **Expansion**: each query term t expands to
  ``E(t) = { t' in index term dictionary : lev(t, t') <= auto(t) }``
  (plain Levenshtein — identical in Spark's ``F.levenshtein`` and
  DuckDB's ``levenshtein``). No expansion cap: pinned exhaustive so the
  oracle is exact. (At 10^12-doc scale a top-50-by-distance cap like
  Lucene's ``max_expansions`` would bound the expansion join; that is a
  recall/cost knob, not a semantics change, and is left off the
  correctness path.)
- **Per-term contribution**: the *best* expansion wins (Lucene fuzzy boost
  shape): ``contrib(t, d) = max over t' in E(t) with tf(t',d) > 0 of
  boost(t, t') * idf(t') * tf_norm(t', d) * (k1 + 1)`` where
  ``boost(t, t') = 1 - lev(t, t') / len(t)`` (1.0 for exact matches).
- **Matching**: conjunctive AND (reference ``operator: "and"`` +
  ``bool.must``): a doc qualifies iff every query term has at least one
  matching expansion in it. ``mode="or"``: any term.
- **Score**: sum of contributions over distinct query terms, float64,
  summation in sorted-query-term order; top-k tie-break (-score, doc_id).
"""

from __future__ import annotations

from oracle.bm25 import BM25Oracle
from sparkfts.analysis import auto_fuzz, tokenize_query

__all__ = [
    "auto_fuzz",
    "levenshtein",
    "damerau_levenshtein",
    "expand",
    "fuzzy_search",
]


def levenshtein(a: str, b: str) -> int:
    """Plain Levenshtein distance (insert/delete/substitute, unit costs).

    Same function family as Spark ``F.levenshtein`` and DuckDB
    ``levenshtein`` — no transpositions, no prefix discounts.
    """
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def damerau_levenshtein(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein distance (adds transpositions).

    ES/Lucene fuzzy queries count a transposition as ONE edit by default
    (``transpositions: true``); plain Levenshtein charges two, which is
    why "teh" does not reach "the" at AUTO distance 1 without this. The
    pinned variant is the UNRESTRICTED distance — identical to DuckDB's
    ``damerau_levenshtein`` so the oracle contract stays SQL-expressible.
    (Lucene's automaton computes the restricted/OSA variant; the two
    differ only on contrived strings like "ca" -> "abc" where an edit
    lands between a transposed pair — never within AUTO:3,6 distances
    of real tokens, and our spec is pinned here, not delegated.)
    """
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    la, lb = len(a), len(b)
    maxdist = la + lb
    # full DP with last-occurrence bookkeeping (Lowrance-Wagner)
    last_row: dict[str, int] = {}
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, la + 1):
        last_col = 0
        for j in range(1, lb + 1):
            i_ = last_row.get(b[j - 1], 0)
            j_ = last_col
            cost = 0 if a[i - 1] == b[j - 1] else 1
            if cost == 0:
                last_col = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost,          # substitute / match
                d[i + 1][j] + 1,         # insert
                d[i][j + 1] + 1,         # delete
                d[i_][j_] + (i - i_ - 1) + 1 + (j - j_ - 1),  # transpose
            )
        last_row[a[i - 1]] = i
    return d[la + 1][lb + 1]


def expand(
    term: str,
    dictionary: list[str],
    transpositions: bool = False,
    prefix_length: int = 0,
) -> list[tuple[str, int]]:
    """All dictionary terms within AUTO distance of ``term`` -> (t', dist).

    ``transpositions``: ES ``fuzzy_transpositions`` — distance is
    Damerau-Levenshtein instead of plain Levenshtein. The pinned default
    stays False (the original oracle contract); ES's own default is true.

    ``prefix_length``: ES fuzzy ``prefix_length`` — candidates must
    share the query term's first N characters exactly.
    """
    d = auto_fuzz(term)
    dist_fn = damerau_levenshtein if transpositions else levenshtein
    pfx = term[: max(0, int(prefix_length))]
    out = []
    for t in dictionary:
        if abs(len(t) - len(term)) > d:
            continue
        if pfx and not t.startswith(pfx):
            continue
        dist = dist_fn(term, t)
        if dist <= d:
            out.append((t, dist))
    return sorted(out)


def fuzzy_search(
    oracle: BM25Oracle,
    query: str,
    k: int = 10,
    mode: str = "and",
    transpositions: bool = False,
    prefix_length: int = 0,
) -> list[tuple[int, float]]:
    """Top-k ``(doc_id, score)`` under the pinned fuzzy semantics above."""
    terms = tokenize_query(query)
    if not terms:
        return []
    dictionary = list(oracle.postings.keys())
    expansions = {
        t: expand(t, dictionary, transpositions, prefix_length)
        for t in terms
    }

    # candidate docs per query term = union of its expansions' postings
    per_term_docs: dict[str, set[int]] = {}
    for t, exps in expansions.items():
        docs: set[int] = set()
        for tprime, _ in exps:
            docs.update(oracle.postings.get(tprime, ()))
        per_term_docs[t] = docs

    if mode == "and":
        candidates = (
            set.intersection(*per_term_docs.values()) if per_term_docs else set()
        )
    elif mode == "or":
        candidates = set().union(*per_term_docs.values())
    else:
        raise ValueError(f"unknown mode {mode!r}")

    k1 = oracle.k1
    scored = []
    for d in candidates:
        dl = oracle.doclen[d]
        norm = k1 * (1.0 - oracle.b + oracle.b * dl / oracle.avgdl)
        s = 0.0
        for t in terms:  # sorted order pinned by tokenize_query
            best = 0.0
            for tprime, dist in expansions[t]:
                tf = oracle.postings.get(tprime, {}).get(d, 0)
                if tf:
                    boost = 1.0 - dist / len(t)
                    c = boost * oracle.idf(tprime) * (tf / (tf + norm)) * (k1 + 1.0)
                    if c > best:
                        best = c
            s += best
        scored.append((d, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]
