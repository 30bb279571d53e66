"""Pure-Python BM25 oracle (the engine's executable spec).

Pinned semantics (SURVEY.md §5.3):
  - analyzer: ``sparkfts.analysis.tokenize`` (lower + ``[a-z0-9]+``) —
    the SAME function the Spark UDFs wrap;
  - BM25 with Lucene-default parameters k1=1.2, b=0.75:
        idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
        tf_norm(t,d)= tf / (tf + k1 * (1 - b + b * dl/avgdl))
        score(q,d)  = sum over distinct sorted query terms of
                      idf(t) * tf_norm(t,d) * (k1 + 1)
    float64 throughout; summation in sorted-term order (deterministic);
  - matching: conjunctive AND by default (every query term must occur in
    the document) per the reference's ``operator: "and"`` + ``bool.must``
    (reference ElasticsearchToNeo4jSync.py:96,102); disjunctive OR mode for
    the WAND path;
  - top-k tie-break: ``(-score, doc_id ascending)``, pinned so
    "rank-identical" is well-defined;
  - default k=10 — the ES server default the reference relies on by
    passing no ``size``/``sort`` (reference ElasticsearchHandler.py:52-74).
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterable

from sparkfts import BM25_B, BM25_K1
from sparkfts.analysis import tokenize, tokenize_query


class BM25Oracle:
    """In-memory inverted index + BM25 scorer over (doc_id, text) pairs."""

    def __init__(
        self,
        docs: Iterable[tuple[int, str]],
        k1: float = BM25_K1,
        b: float = BM25_B,
        stopwords: Iterable[str] | None = None,
        stemmer: str | None = None,
    ) -> None:
        self.k1 = float(k1)
        self.b = float(b)
        # index-time stop filter (sparkfts.analysis.tokenize semantics:
        # removed tokens do not count toward doclen); the SAME list
        # applies at query analysis in search()
        self.stopwords = frozenset(stopwords) if stopwords else None
        # index-time stemmer (sparkfts.analysis semantics: applied
        # after the stop filter; 1:1, doclen unchanged); the SAME
        # option applies at query analysis in search()
        self.stemmer = stemmer or None
        self.doclen: dict[int, int] = {}
        # term -> {doc_id: tf}
        self.postings: dict[str, dict[int, int]] = {}
        for doc_id, text in docs:
            doc_id = int(doc_id)
            if doc_id in self.doclen:
                raise ValueError(f"duplicate doc_id {doc_id}")
            terms = tokenize(text, self.stopwords, self.stemmer)
            self.doclen[doc_id] = len(terms)
            for term, tf in Counter(terms).items():
                self.postings.setdefault(term, {})[doc_id] = tf
        self.n_docs = len(self.doclen)
        total = sum(self.doclen.values())
        self.avgdl = (total / self.n_docs) if self.n_docs else 0.0

    # -- statistics ----------------------------------------------------------

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def idf(self, term: str) -> float:
        df = self.df(term)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    # -- scoring -------------------------------------------------------------

    def score(self, terms: list[str], doc_id: int) -> float:
        """BM25 score of one doc for distinct sorted `terms` (float64)."""
        dl = self.doclen[doc_id]
        norm = self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        s = 0.0
        for t in terms:  # sorted order pinned by caller
            tf = self.postings.get(t, {}).get(doc_id, 0)
            if tf:
                s += self.idf(t) * (tf / (tf + norm)) * (self.k1 + 1.0)
        return s

    def search(
        self, query: str, k: int = 10, mode: str = "and"
    ) -> list[tuple[int, float]]:
        """Top-k ``(doc_id, score)`` for a free-text query.

        mode="and": doc must contain every distinct query term
        (reference's conjunctive semantics). mode="or": any term.
        Empty query matches nothing (the reference emits ``{}`` i.e.
        match-all at the *search layer* for empty input — we pin
        empty -> empty result set for the engine, asserted in tests).
        """
        terms = tokenize_query(query, self.stopwords, self.stemmer)
        if not terms:
            return []
        if mode == "and":
            candidate_sets = [
                set(self.postings.get(t, ())) for t in terms
            ]
            candidates = set.intersection(*candidate_sets) if candidate_sets else set()
        elif mode == "or":
            candidates = set()
            for t in terms:
                candidates.update(self.postings.get(t, ()))
        else:
            raise ValueError(f"unknown mode {mode!r}")
        scored = [(d, self.score(terms, d)) for d in candidates]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
