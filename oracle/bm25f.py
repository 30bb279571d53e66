"""Pure-Python BM25F oracle — true weighted-field scoring, pinned.

The multifield module's ``best_fields`` combiner (ES ``multi_match``
default) takes the MAX over per-field BM25 scores; BM25F (Robertson &
Zaragoza's simple variant) instead combines term frequencies ACROSS
fields before saturation, which is what ES's ``combined_fields`` query
implements. Pinned formula (executable spec for
``sparkfts.multifield.bm25f_batch``):

    tf~_f(t, d)  = tf_f(t, d) / (1 - b + b * dl_f(d) / avgdl_f)
    tfc(t, d)    = sum over fields f of  w_f * tf~_f(t, d)
    score(t, d)  = idf_any(t) * tfc / (k1 + tfc) * (k1 + 1)
    score(d)     = sum over query terms t (sorted-term order, float64)

where ``w_f`` comes from the ES boost spec (``title^2`` -> 2.0),
``b``/``k1`` are the engine's BM25 constants applied per field with that
FIELD's own avgdl, and ``idf_any(t)`` uses the document-level df: the
number of docs containing ``t`` in ANY of the queried fields (the
"combined document" df of the BM25F literature; ES combined_fields
likewise uses a single blended df). Conjunctive mode requires every
query term to hit in at least one field. Ties break (-score, doc_id).
"""

from __future__ import annotations

import math
from collections.abc import Iterable

from sparkfts import BM25_B, BM25_K1
from sparkfts.analysis import tokenize, tokenize_query


class BM25FOracle:
    """In-memory multi-field index + BM25F scorer.

    ``docs``: iterable of ``(doc_id, {field: text})``.
    """

    def __init__(
        self,
        docs: Iterable[tuple[int, dict[str, str]]],
        fields: list[tuple[str, float]],
        k1: float = BM25_K1,
        b: float = BM25_B,
    ) -> None:
        self.k1, self.b = float(k1), float(b)
        self.fields = list(fields)  # [(name, weight)]
        self.tf: dict[str, dict[str, dict[int, int]]] = {
            f: {} for f, _ in fields
        }  # field -> term -> doc -> tf
        self.dl: dict[str, dict[int, int]] = {f: {} for f, _ in fields}
        self.docs_with: dict[str, set[int]] = {}  # term -> docs (any field)
        self.all_docs: set[int] = set()
        for doc_id, by_field in docs:
            doc_id = int(doc_id)
            self.all_docs.add(doc_id)
            for f, _w in fields:
                toks = tokenize(by_field.get(f, "") or "")
                self.dl[f][doc_id] = len(toks)
                for t in toks:
                    self.tf[f].setdefault(t, {})
                    self.tf[f][t][doc_id] = self.tf[f][t].get(doc_id, 0) + 1
                    self.docs_with.setdefault(t, set()).add(doc_id)
        self.n_docs = len(self.all_docs)
        self.avgdl = {
            f: (sum(self.dl[f].values()) / self.n_docs) if self.n_docs else 0.0
            for f, _ in fields
        }

    def idf_any(self, term: str) -> float:
        df = len(self.docs_with.get(term, ()))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def _tfc(self, term: str, doc_id: int) -> float:
        tfc = 0.0
        for f, w in self.fields:  # field-spec order fold (pinned)
            tf = self.tf[f].get(term, {}).get(doc_id, 0)
            if tf:
                dl = self.dl[f][doc_id]
                tfc += w * (
                    tf / (1.0 - self.b + self.b * dl / self.avgdl[f])
                )
        return tfc

    def search(
        self, query: str, k: int = 10, mode: str = "and"
    ) -> list[tuple[int, float]]:
        terms = tokenize_query(query)  # sorted distinct
        if not terms or self.n_docs == 0:
            return []
        cand: set[int] | None = None
        for t in terms:
            hit = self.docs_with.get(t, set())
            if mode == "and":
                cand = hit if cand is None else (cand & hit)
                if not cand:
                    return []
            else:
                cand = hit if cand is None else (cand | hit)
        scored = []
        for d in cand or ():
            s = 0.0
            for t in terms:  # sorted-term fold
                tfc = self._tfc(t, d)
                if tfc > 0.0:
                    s += (
                        self.idf_any(t)
                        * (tfc / (self.k1 + tfc))
                        * (self.k1 + 1.0)
                    )
            scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
