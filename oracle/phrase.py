"""Pure-Python phrase-query oracle (``match_phrase`` semantics pinned).

ES/Lucene ``match_phrase`` (the positional-query family the reference's
ES backend supports; its DSL never emits one — SURVEY.md §2 "optional"
gap, closed here): a document matches iff the query terms occur at
consecutive positions in order. Scoring pins Lucene's PhraseQuery shape:
the phrase acts as ONE pseudo-term whose frequency is the number of
phrase occurrences, weighted by the sum of the member terms' idfs:

    tfp(d)   = |{p : t_i at position p+i for all i}|
    score(d) = (sum_i idf(t_i)) * tfp / (tfp + k1*(1-b+b*dl/avgdl))
               * (k1 + 1)

idf/df are per-TERM corpus statistics (same as BM25); summation of idfs
runs in phrase order (deterministic); ties break (-score, doc_id asc).
Duplicate terms in the phrase are kept (unlike the conjunctive
``tokenize_query`` set semantics) — "buffalo buffalo" is a real phrase.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

from sparkfts import BM25_B, BM25_K1
from sparkfts.analysis import tokenize


class PhraseOracle:
    """In-memory positional index + phrase scorer over (doc_id, text)."""

    def __init__(
        self,
        docs: Iterable[tuple[int, str]],
        k1: float = BM25_K1,
        b: float = BM25_B,
    ) -> None:
        self.k1 = float(k1)
        self.b = float(b)
        self.doclen: dict[int, int] = {}
        # term -> {doc_id: sorted positions}
        self.positions: dict[str, dict[int, list[int]]] = {}
        for doc_id, text in docs:
            doc_id = int(doc_id)
            if doc_id in self.doclen:
                raise ValueError(f"duplicate doc_id {doc_id}")
            terms = tokenize(text)
            self.doclen[doc_id] = len(terms)
            for pos, term in enumerate(terms):
                self.positions.setdefault(term, {}).setdefault(
                    doc_id, []
                ).append(pos)
        self.n_docs = len(self.doclen)
        total = sum(self.doclen.values())
        self.avgdl = (total / self.n_docs) if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.positions.get(term, ()))

    def idf(self, term: str) -> float:
        df = self.df(term)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    @staticmethod
    def _freq_from_plists(plists: list[list[int]]) -> int:
        """Exact-adjacency start count from per-slot position lists."""
        pos_sets = [
            {p - i for p in plist} for i, plist in enumerate(plists)
        ]
        return len(set.intersection(*pos_sets))

    @staticmethod
    def _sloppy_from_plists(plists: list[list[int]], slop: int) -> int:
        """Greedy ordered-chain start count (see :meth:`sloppy_freq`)."""
        from bisect import bisect_right

        m = len(plists)
        tfp = 0
        for p0 in plists[0]:
            cur = p0
            ok = True
            for plist in plists[1:]:
                j = bisect_right(plist, cur)
                if j >= len(plist):
                    ok = False
                    break
                cur = plist[j]
            if ok and cur - p0 - (m - 1) <= slop:
                tfp += 1
        return tfp

    def phrase_freq(self, terms: list[str], doc_id: int) -> int:
        """Count of positions p with terms[i] at p+i for every i."""
        plists = []
        for t in terms:
            plist = self.positions.get(t, {}).get(doc_id)
            if not plist:
                return 0
            plists.append(plist)
        return self._freq_from_plists(plists)

    def sloppy_freq(self, terms: list[str], doc_id: int, slop: int) -> int:
        """PINNED slop semantics (ordered window-tolerant matching):

        a start position ``p0`` of ``terms[0]`` matches iff the greedy
        in-order chain (each next term at the SMALLEST position strictly
        after the previous term's) completes with total inserted gap
        ``p_last - p0 - (m-1) <= slop``. Greedy-minimal chaining is
        optimal (choosing the smallest admissible next position can only
        shrink the final span), so this counts exactly the starts
        admitting ANY in-order match within the window. ``slop=0``
        reduces to exact adjacency == :meth:`phrase_freq` (tested).
        Unlike Lucene's SloppyPhraseQuery this never matches out of
        order, and tfp counts matches unweighted (no 1/(1+distance)
        sloppy-freq damping) — a deliberate, simpler pin.
        """
        plists = []
        for t in terms:
            plist = self.positions.get(t, {}).get(doc_id)
            if not plist:
                return 0
            plists.append(plist)
        return self._sloppy_from_plists(plists, slop)

    def search_phrase_prefix(
        self,
        phrase: str,
        k: int = 10,
        max_expansions: int = 50,
        slop: int = 0,
    ) -> list[tuple[int, float]]:
        """PINNED ``match_phrase_prefix`` semantics (ES
        search-as-you-type: phrase whose LAST term is a prefix):

        - expansions E = dictionary terms starting with the last term,
          in sorted term order, capped at ``max_expansions`` (ES caps
          the same way; sorted-order cap is the deterministic pin);
        - the last slot matches at a position iff ANY e in E occurs
          there (the per-doc last-slot position list is the union of
          the expansions' lists); fixed slots match exactly; start
          counting (exact or sloppy) is identical to
          :meth:`phrase_freq` / :meth:`sloppy_freq` over those lists;
        - weight = sum of the fixed terms' idfs (phrase order) plus
          ONE virtual-prefix idf computed from
          ``df_prefix = |{docs containing any e in E}|`` — the union
          df, not a sum of expansion dfs (a doc with two expansions
          counts once);
        - score(d) = weight * tfp/(tfp + k1*(1-b+b*dl/avgdl)) * (k1+1),
          ties (-score, doc_id asc). A one-term query degenerates to a
          pure prefix-as-phrase: every expansion occurrence is a match.
        """
        terms = tokenize(phrase)
        if not terms or self.n_docs == 0:
            return []
        fixed, prefix = terms[:-1], terms[-1]
        expansions = sorted(
            t for t in self.positions if t.startswith(prefix)
        )[: int(max_expansions)]
        if not expansions:
            return []
        docs_any = {
            d for t in expansions for d in self.positions.get(t, ())
        }
        dfp = len(docs_any)
        weight = sum(self.idf(t) for t in fixed)  # phrase-order fold
        weight += math.log(1.0 + (self.n_docs - dfp + 0.5) / (dfp + 0.5))
        # candidates: docs containing the rarest fixed term, else the
        # prefix union set
        if fixed:
            rare = min(fixed, key=self.df)
            cand = set(self.positions.get(rare, ())) & docs_any \
                if self.df(rare) > dfp else set(self.positions.get(rare, ()))
        else:
            cand = docs_any
        scored = []
        for doc_id in cand:
            plists = []
            ok = True
            for t in fixed:
                plist = self.positions.get(t, {}).get(doc_id)
                if not plist:
                    ok = False
                    break
                plists.append(plist)
            if not ok:
                continue
            last = sorted(
                {
                    p
                    for t in expansions
                    for p in self.positions.get(t, {}).get(doc_id, ())
                }
            )
            if not last:
                continue
            plists.append(last)
            tfp = (
                self._freq_from_plists(plists)
                if slop == 0
                else self._sloppy_from_plists(plists, slop)
            )
            if tfp == 0:
                continue
            dl = self.doclen[doc_id]
            norm = self.k1 * (1 - self.b + self.b * dl / self.avgdl)
            scored.append(
                (doc_id, weight * (tfp / (tfp + norm)) * (self.k1 + 1))
            )
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def search(
        self, phrase: str, k: int = 10, slop: int = 0
    ) -> list[tuple[int, float]]:
        """Top-k ``(doc_id, score)`` documents containing the phrase
        (exactly for ``slop=0``, within the ordered window otherwise)."""
        terms = tokenize(phrase)  # order + duplicates preserved
        if not terms or self.n_docs == 0:
            return []
        # candidates: docs containing the rarest term (correct and cheap)
        rare = min(terms, key=self.df)
        idf_sum = sum(self.idf(t) for t in terms)  # phrase-order fold
        scored = []
        for doc_id in self.positions.get(rare, {}):
            tfp = (
                self.phrase_freq(terms, doc_id)
                if slop == 0
                else self.sloppy_freq(terms, doc_id, slop)
            )
            if tfp == 0:
                continue
            dl = self.doclen[doc_id]
            norm = self.k1 * (1 - self.b + self.b * dl / self.avgdl)
            scored.append(
                (doc_id, idf_sum * (tfp / (tfp + norm)) * (self.k1 + 1))
            )
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
