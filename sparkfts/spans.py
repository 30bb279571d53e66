"""ES span queries over the positions table: ``span_near``
(unordered), ``span_first``, ``span_or``, ``span_not`` and
``span_containing`` (round-4 VERDICT gap #5 — family complete).

``span_near`` with ``in_order: false`` is the proximity query behind
"these words appear near each other, any order" — the last positional
gap in the engine's ES surface (ordered proximity = ``match_phrase``
slop, sparkfts.phrase).  ``span_first`` constrains a term to the first
``end`` positions (title-ish matching on a body field).

Round-5 additions (pinned on single-term sub-spans, the deterministic
subset — Lucene's span algebra over arbitrary nested spans is
iterator-defined):

- span_or (terms): a doc's span set = the UNION of the member terms'
  positions; ``tfp`` = |union| (positions are distinct by
  construction); idf = sum of member idfs in query order (the span
  family's pseudo-term pin).
- span_not (include, exclude, pre, post): ``tfp`` = include positions
  ``p`` with NO exclude occurrence in ``[p - pre, p + post]``
  (single-term spans are width 1, so overlap = position equality and
  pre/post extend the forbidden window, exactly Lucene's dist
  semantics at width 1); idf = include term's.
- span_containing (big, little, slop): big = the unordered window of
  the big terms (same anchors as span_near's pin: positions ``p``
  where EVERY big term occurs in ``[p, p + W]``, ``W = slop + n - 1``);
  ``tfp`` = anchors whose window also contains an occurrence of
  ``little``; idf = sum of big idfs + little idf.

Pinned semantics (documented exactly because Lucene's
NearSpansUnordered is iterator-defined, not formula-defined):

- span_near (unordered, n terms, slop): window span
  ``W = slop + n - 1``; ``tfp`` = the number of DISTINCT positions
  ``p`` occupied by ANY query term such that EVERY query term has an
  occurrence in ``[p, p + W]``.  Each anchor position counts once.
  For two terms this equals "some occurrence of the other term within
  ``slop + 1`` positions after the anchor", the natural symmetric
  window (each unordered pair is counted at its left end).  This is
  the same kind of deterministic pin as oracle.phrase's ordered-greedy
  slop — ES-approximate where Lucene is iterator-defined, exact where
  the window reading is unambiguous (slop=0 adjacency, any order).
- span_first (term, end): ``tfp`` = occurrences at position < ``end``
  (Lucene: span end <= ``end``; a single-term span at position p has
  end p+1, so p + 1 <= end <=> p < end).
- scoring: the engine's pinned phrase form — one pseudo-term with
  ``idf = sum of member idfs in query order``,
  ``score = idf * tfp/(tfp + k1*(1-b+b*dl/avgdl)) * (k1+1)``
  (identical arithmetic to sparkfts.phrase / oracle.phrase).

Execution shape = match_phrase_batch (sparkfts/phrase.py:392):
tbucket- and term-pushed positions scan, per-shard Arrow kernel with
vectorized searchsorted window checks, per-shard top-k, global
query-partitioned window over ``<= n_shards * k`` rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkfts.analysis import analysis_opts, tokenize
from sparkfts.query import idf_fn
from sparkfts.session import session_cores as _session_cores
from sparkfts.wand import BM25_B, BM25_K1


def unordered_tfp(
    pos_lists: list[np.ndarray], slop: int
) -> int:
    """The pinned unordered-window count (module docstring)."""
    n = len(pos_lists)
    span = slop + n - 1
    anchors = np.unique(np.concatenate(pos_lists))
    ok = np.ones(anchors.size, bool)
    for plist in pos_lists:
        idx = np.searchsorted(plist, anchors, side="left")
        has = idx < plist.size
        ok &= has & (
            plist[np.minimum(idx, plist.size - 1)] <= anchors + span
        )
    return int(ok.sum())


def _make_span_scorer(
    queries_analyzed: list[tuple[int, list[str], int]],
    idf_sums: dict[int, float],
    avgdl: float,
    slop: int,
    exclude: np.ndarray | None = None,
):
    k1, b = BM25_K1, BM25_B

    def scorer(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        if len(pdf):
            by_term: dict[str, dict[int, tuple[np.ndarray, int]]] = {}
            terms_np = pdf["term"].to_numpy()
            docs_np = pdf["doc_id"].to_numpy()
            pos_np = pdf["positions"].to_numpy()
            dl_np = pdf["doclen"].to_numpy()
            for i in range(len(pdf)):
                by_term.setdefault(terms_np[i], {})[int(docs_np[i])] = (
                    np.asarray(pos_np[i], dtype=np.int64),
                    int(dl_np[i]),
                )
            from sparkfts.wand import exclude_mask

            for qid, terms, k in queries_analyzed:
                maps = [by_term.get(t) for t in terms]
                if any(m is None for m in maps):
                    continue
                rare = min(maps, key=len)
                doc_scores: list[tuple[int, float]] = []
                for doc_id, (_rp, dl) in rare.items():
                    if exclude is not None and exclude.size and not \
                            exclude_mask(
                                np.array([doc_id], np.int64), exclude
                            )[0]:
                        continue
                    plists = []
                    ok = True
                    for m in maps:
                        entry = m.get(doc_id)
                        if entry is None:
                            ok = False
                            break
                        plists.append(entry[0])
                    if not ok:
                        continue
                    tfp = unordered_tfp(plists, slop)
                    if tfp == 0:
                        continue
                    norm = k1 * (1 - b + b * dl / avgdl)
                    doc_scores.append(
                        (
                            doc_id,
                            idf_sums[qid]
                            * (tfp / (tfp + norm))
                            * (k1 + 1),
                        )
                    )
                if doc_scores:
                    doc_scores.sort(key=lambda x: (-x[1], x[0]))
                    doc_scores = doc_scores[:k]
                    out.append(
                        pd.DataFrame(
                            {
                                "query_id": np.full(
                                    len(doc_scores), qid, np.int32
                                ),
                                "doc_id": np.array(
                                    [d for d, _ in doc_scores], np.int64
                                ),
                                "score": np.array(
                                    [s for _, s in doc_scores],
                                    np.float64,
                                ),
                            }
                        )
                    )
        if not out:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int32"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    return scorer


def span_near_batch(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, int]],
    slop: int = 0,
    in_order: bool = True,
) -> DataFrame:
    """ES ``span_near`` -> ``(query_id, rank, doc_id, score)``.

    ``in_order=True`` is exactly the engine's pinned ordered proximity
    (delegates to :func:`sparkfts.phrase.match_phrase_batch`);
    ``in_order=False`` uses the pinned unordered-window count above.
    """
    if in_order:
        from sparkfts.phrase import match_phrase_batch

        return match_phrase_batch(spark, index_dir, queries, slop=slop)

    from sparkfts.index import (
        df_map_for,
        in_list,
        lit_map,
        read_meta,
        term_bucket,
    )
    from sparkfts.phrase import load_positions
    from sparkfts.query import _empty_results

    meta = read_meta(index_dir)
    sw, stem = analysis_opts(meta)
    analyzed = [
        (qid, tokenize(text, sw, stem), k) for qid, text, k in queries
    ]
    analyzed = [(qid, t, k) for qid, t, k in analyzed if t]
    if not analyzed or meta["n_docs"] == 0:
        return _empty_results(spark)
    all_terms = sorted({t for _, terms, _ in analyzed for t in terms})
    buckets = sorted(
        {term_bucket(t, meta["n_tbuckets"]) for t in all_terms}
    )
    df_map = df_map_for(spark, index_dir, all_terms)
    idf_sums = {}
    for qid, terms, _ in analyzed:
        s = 0.0
        for t in terms:
            s += idf_fn(meta["n_docs"], df_map.get(t, 0))
        idf_sums[qid] = s
    from sparkfts.deletes import load_tombstones

    pos = (
        load_positions(spark, index_dir)
        .where(in_list("tbucket", buckets) & in_list("term", all_terms))
        .coalesce(_session_cores(spark))
    )
    scorer = _make_span_scorer(
        analyzed, idf_sums, meta["avgdl"], int(slop),
        exclude=load_tombstones(spark, index_dir),
    )
    local = pos.groupby("shard").applyInPandas(
        lambda pdf: scorer(pdf),
        "query_id int, doc_id long, score double",
    )
    k_map = lit_map((qid, k) for qid, _, k in analyzed)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.element_at(k_map, F.col("query_id")))
        .select("query_id", F.col("rank").cast("int"), "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def _run_span_specs(
    spark: SparkSession, index_dir: str, specs: list[dict]
) -> DataFrame:
    """Shared runner for the r5 span ops.  ``specs`` rows:
    ``{qid, required: [terms all needed], any: [terms any-of], k,
    idf_terms: [terms summed for the pseudo-idf], tfp: fn(plmap)->int}``
    where ``plmap`` maps each present term to its sorted positions.
    Plan shape = span_near_batch: tbucket+term-pushed positions scan,
    per-shard Arrow kernel, bounded global window."""
    from sparkfts.deletes import load_tombstones
    from sparkfts.index import (
        df_map_for,
        in_list,
        lit_map,
        read_meta,
        term_bucket,
    )
    from sparkfts.phrase import load_positions
    from sparkfts.query import _empty_results

    meta = read_meta(index_dir)
    specs = [s for s in specs if s["required"] or s["any"]]
    if not specs or meta["n_docs"] == 0:
        return _empty_results(spark)
    all_terms = sorted(
        {t for s in specs for t in (*s["required"], *s["any"])}
    )
    buckets = sorted(
        {term_bucket(t, meta["n_tbuckets"]) for t in all_terms}
    )
    df_map = df_map_for(spark, index_dir, all_terms)
    idfs = {
        s["qid"]: sum(
            idf_fn(meta["n_docs"], df_map.get(t, 0))
            for t in s["idf_terms"]
        )
        for s in specs
    }
    tomb = load_tombstones(spark, index_dir)
    pos = (
        load_positions(spark, index_dir)
        .where(in_list("tbucket", buckets) & in_list("term", all_terms))
        .coalesce(_session_cores(spark))
    )
    avgdl = meta["avgdl"]
    k1, b = BM25_K1, BM25_B

    def scorer(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        if len(pdf):
            from sparkfts.wand import exclude_mask

            by_term: dict[str, dict[int, tuple[np.ndarray, int]]] = {}
            terms_np = pdf["term"].to_numpy()
            docs_np = pdf["doc_id"].to_numpy()
            pos_np = pdf["positions"].to_numpy()
            dl_np = pdf["doclen"].to_numpy()
            for i in range(len(pdf)):
                by_term.setdefault(terms_np[i], {})[int(docs_np[i])] = (
                    np.asarray(pos_np[i], dtype=np.int64),
                    int(dl_np[i]),
                )
            for s in specs:
                req_maps = [by_term.get(t) for t in s["required"]]
                if any(m is None for m in req_maps):
                    continue
                if req_maps:
                    cand = set(min(req_maps, key=len))
                else:
                    cand = set()
                    for t in s["any"]:
                        cand |= set(by_term.get(t, {}))
                doc_scores: list[tuple[int, float]] = []
                for doc_id in cand:
                    if tomb is not None and tomb.size and not \
                            exclude_mask(
                                np.array([doc_id], np.int64), tomb
                            )[0]:
                        continue
                    plmap, dl, ok = {}, None, True
                    for t in (*s["required"], *s["any"]):
                        entry = by_term.get(t, {}).get(doc_id)
                        if entry is None:
                            if t in s["required"]:
                                ok = False
                                break
                            continue
                        plmap[t] = entry[0]
                        dl = entry[1]
                    if not ok or dl is None:
                        continue
                    tfp = int(s["tfp"](plmap))
                    if tfp == 0:
                        continue
                    norm = k1 * (1 - b + b * dl / avgdl)
                    doc_scores.append(
                        (doc_id,
                         idfs[s["qid"]] * (tfp / (tfp + norm)) * (k1 + 1))
                    )
                if doc_scores:
                    doc_scores.sort(key=lambda x: (-x[1], x[0]))
                    doc_scores = doc_scores[: s["k"]]
                    out.append(
                        pd.DataFrame(
                            {
                                "query_id": np.full(
                                    len(doc_scores), s["qid"], np.int32
                                ),
                                "doc_id": np.array(
                                    [d for d, _ in doc_scores], np.int64
                                ),
                                "score": np.array(
                                    [sc for _, sc in doc_scores],
                                    np.float64,
                                ),
                            }
                        )
                    )
        if not out:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int32"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    local = pos.groupby("shard").applyInPandas(
        lambda pdf: scorer(pdf),
        "query_id int, doc_id long, score double",
    )
    k_map = lit_map((s["qid"], s["k"]) for s in specs)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.element_at(k_map, F.col("query_id")))
        .select("query_id", F.col("rank").cast("int"), "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def span_or_batch(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, int]],
) -> DataFrame:
    """ES ``span_or`` over single-term clauses (module docstring pin):
    ``tfp`` = |union of member positions|, idf = summed member idfs."""
    from sparkfts.index import read_meta

    sw, stem = analysis_opts(read_meta(index_dir))
    specs = []
    for qid, text, k in queries:
        terms = sorted(set(tokenize(text, sw, stem)))
        if not terms:
            continue

        def tfp(plmap, _terms=tuple(terms)):
            pls = [plmap[t] for t in _terms if t in plmap]
            return np.unique(np.concatenate(pls)).size if pls else 0

        specs.append(
            {"qid": qid, "required": [], "any": terms, "k": int(k),
             "idf_terms": terms, "tfp": tfp}
        )
    return _run_span_specs(spark, index_dir, specs)


def span_not_batch(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, str, int]],
    pre: int = 0,
    post: int = 0,
) -> DataFrame:
    """ES ``span_not``: ``(qid, include_term, exclude_term, k)`` —
    include occurrences with no exclude occurrence in
    ``[p - pre, p + post]`` (module docstring pin)."""
    from sparkfts.index import read_meta

    sw, stem = analysis_opts(read_meta(index_dir))
    specs = []
    for qid, inc, exc, k in queries:
        inc_t = tokenize(inc, sw, stem)
        exc_t = tokenize(exc, sw, stem)
        if len(inc_t) != 1 or len(exc_t) != 1:
            raise ValueError(
                "span_not takes single-term include and exclude"
            )

        def tfp(plmap, _i=inc_t[0], _e=exc_t[0], _pre=int(pre),
                _post=int(post)):
            ip = plmap.get(_i)
            if ip is None:
                return 0
            ep = plmap.get(_e)
            if ep is None or ep.size == 0:
                return int(ip.size)
            lo = np.searchsorted(ep, ip - _pre, side="left")
            hit = (lo < ep.size) & (
                ep[np.minimum(lo, ep.size - 1)] <= ip + _post
            )
            return int((~hit).sum())

        specs.append(
            {"qid": qid, "required": [inc_t[0]], "any": [exc_t[0]],
             "k": int(k), "idf_terms": [inc_t[0]], "tfp": tfp}
        )
    return _run_span_specs(spark, index_dir, specs)


def span_containing_batch(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, str, int]],
    slop: int = 0,
) -> DataFrame:
    """ES ``span_containing``: ``(qid, big_text, little_term, k)`` —
    unordered big-window anchors (span_near's pin) whose window also
    contains ``little`` (module docstring pin)."""
    from sparkfts.index import read_meta

    sw, stem = analysis_opts(read_meta(index_dir))
    specs = []
    for qid, big, little, k in queries:
        big_t = tokenize(big, sw, stem)
        lit_t = tokenize(little, sw, stem)
        if not big_t or len(lit_t) != 1:
            raise ValueError(
                "span_containing takes big terms + ONE little term"
            )
        span = int(slop) + len(big_t) - 1

        def tfp(plmap, _big=tuple(big_t), _l=lit_t[0], _span=span):
            pls = [plmap.get(t) for t in _big]
            lp = plmap.get(_l)
            if any(p is None for p in pls) or lp is None:
                return 0
            anchors = np.unique(np.concatenate(pls))
            ok = np.ones(anchors.size, bool)
            for plist in (*pls, lp):
                idx = np.searchsorted(plist, anchors, side="left")
                ok &= (idx < plist.size) & (
                    plist[np.minimum(idx, plist.size - 1)]
                    <= anchors + _span
                )
            return int(ok.sum())

        specs.append(
            {"qid": qid, "required": sorted({*big_t, lit_t[0]}),
             "any": [], "k": int(k),
             "idf_terms": [*big_t, lit_t[0]], "tfp": tfp}
        )
    return _run_span_specs(spark, index_dir, specs)


def span_within_batch(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, str, int]],
    slop: int = 0,
) -> DataFrame:
    """ES ``span_within``: ``(qid, big_text, little_term, k)`` — the
    symmetric twin of span_containing: matches are returned FROM the
    little side, so ``tfp`` counts little-term occurrences that fall
    inside some qualifying big window (an anchor per span_near's pin
    whose window holds every big term), and idf is the little term's
    alone (Lucene: the little query's spans, scored as themselves)."""
    from sparkfts.index import read_meta

    sw, stem = analysis_opts(read_meta(index_dir))
    specs = []
    for qid, big, little, k in queries:
        big_t = tokenize(big, sw, stem)
        lit_t = tokenize(little, sw, stem)
        if not big_t or len(lit_t) != 1:
            raise ValueError(
                "span_within takes big terms + ONE little term"
            )
        span = int(slop) + len(big_t) - 1

        def tfp(plmap, _big=tuple(big_t), _l=lit_t[0], _span=span):
            pls = [plmap.get(t) for t in _big]
            lp = plmap.get(_l)
            if any(p is None for p in pls) or lp is None:
                return 0
            anchors = np.unique(np.concatenate(pls))
            ok = np.ones(anchors.size, bool)
            for plist in pls:
                idx = np.searchsorted(plist, anchors, side="left")
                ok &= (idx < plist.size) & (
                    plist[np.minimum(idx, plist.size - 1)]
                    <= anchors + _span
                )
            anchors = anchors[ok]
            if not anchors.size:
                return 0
            # little occurrences covered by ANY qualifying window:
            # p is inside [a, a + span] for some anchor a <= p
            ai = np.searchsorted(anchors, lp, side="right") - 1
            covered = (ai >= 0) & (lp <= anchors[np.maximum(ai, 0)] + _span)
            return int(covered.sum())

        specs.append(
            {"qid": qid, "required": sorted({*big_t, lit_t[0]}),
             "any": [], "k": int(k),
             "idf_terms": [lit_t[0]], "tfp": tfp}
        )
    return _run_span_specs(spark, index_dir, specs)


def span_first_batch(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, int, int]],
    ) -> DataFrame:
    """ES ``span_first``: ``(query_id, term, end, k)`` — the term
    scored on occurrences at position < ``end`` only (tfp = count of
    qualifying positions; docs with none drop out). Same plan shape as
    span_near."""
    from sparkfts.index import (
        df_map_for,
        in_list,
        lit_map,
        read_meta,
        term_bucket,
    )
    from sparkfts.phrase import load_positions
    from sparkfts.query import _empty_results

    meta = read_meta(index_dir)
    sw, stem = analysis_opts(meta)
    analyzed = []
    for qid, text, end, k in queries:
        toks = tokenize(text, sw, stem)
        if len(toks) != 1:
            raise ValueError("span_first takes exactly one term")
        analyzed.append((qid, toks[0], int(end), k))
    if not analyzed or meta["n_docs"] == 0:
        return _empty_results(spark)
    all_terms = sorted({t for _, t, _, _ in analyzed})
    buckets = sorted(
        {term_bucket(t, meta["n_tbuckets"]) for t in all_terms}
    )
    df_map = df_map_for(spark, index_dir, all_terms)
    idfs = {
        qid: idf_fn(meta["n_docs"], df_map.get(t, 0))
        for qid, t, _, _ in analyzed
    }
    from sparkfts.deletes import load_tombstones

    tomb = load_tombstones(spark, index_dir)
    pos = (
        load_positions(spark, index_dir)
        .where(in_list("tbucket", buckets) & in_list("term", all_terms))
        .coalesce(_session_cores(spark))
    )
    avgdl = meta["avgdl"]
    k1, b = BM25_K1, BM25_B

    def scorer(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        if len(pdf):
            from sparkfts.wand import exclude_mask

            by_term: dict[str, dict[int, tuple[np.ndarray, int]]] = {}
            terms_np = pdf["term"].to_numpy()
            docs_np = pdf["doc_id"].to_numpy()
            pos_np = pdf["positions"].to_numpy()
            dl_np = pdf["doclen"].to_numpy()
            for i in range(len(pdf)):
                by_term.setdefault(terms_np[i], {})[int(docs_np[i])] = (
                    np.asarray(pos_np[i], dtype=np.int64),
                    int(dl_np[i]),
                )
            for qid, term, end, k in analyzed:
                m = by_term.get(term)
                if not m:
                    continue
                doc_scores: list[tuple[int, float]] = []
                for doc_id, (plist, dl) in m.items():
                    if tomb is not None and tomb.size and not \
                            exclude_mask(
                                np.array([doc_id], np.int64), tomb
                            )[0]:
                        continue
                    tfp = int(
                        np.searchsorted(plist, end, side="left")
                    )
                    if tfp == 0:
                        continue
                    norm = k1 * (1 - b + b * dl / avgdl)
                    doc_scores.append(
                        (
                            doc_id,
                            idfs[qid]
                            * (tfp / (tfp + norm))
                            * (k1 + 1),
                        )
                    )
                if doc_scores:
                    doc_scores.sort(key=lambda x: (-x[1], x[0]))
                    doc_scores = doc_scores[:k]
                    out.append(
                        pd.DataFrame(
                            {
                                "query_id": np.full(
                                    len(doc_scores), qid, np.int32
                                ),
                                "doc_id": np.array(
                                    [d for d, _ in doc_scores], np.int64
                                ),
                                "score": np.array(
                                    [s for _, s in doc_scores],
                                    np.float64,
                                ),
                            }
                        )
                    )
        if not out:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int32"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    local = pos.groupby("shard").applyInPandas(
        lambda pdf: scorer(pdf),
        "query_id int, doc_id long, score double",
    )
    k_map = lit_map((qid, k) for qid, _, _, k in analyzed)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.element_at(k_map, F.col("query_id")))
        .select("query_id", F.col("rank").cast("int"), "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def span_multi_batch(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, int]],
    kind: str = "prefix",
    max_expansions: int | None = None,
) -> DataFrame:
    """ES ``span_multi``: wrap a multi-term (prefix / wildcard) query
    as a span clause. Pinned rewrite = Lucene's
    ``SpanMultiTermQueryWrapper`` span rewrite: the pattern expands
    against the terms dictionary and the span becomes a ``span_or``
    over the expansions — ``tfp`` = |union of expansion positions|,
    pseudo-idf = summed expansion idfs (the :func:`span_or_batch`
    pin), so ``span_multi(prefix "x")`` == ``span_or`` of the
    expansions exactly.

    Plan: one row-group-pruned dictionary range scan per batch (the
    prefix/wildcard expansion collect, request-bounded by
    ``max_expansions``), then the shared positions kernel — no new
    corpus-scale stage."""
    from sparkfts.index import read_meta
    from sparkfts.prefix import expand_prefix, expand_wildcard

    meta = read_meta(index_dir)
    pats = [(qid, p) for qid, p, _k in queries]
    if kind == "prefix":
        exp = expand_prefix(
            spark, index_dir, pats, meta["n_docs"], max_expansions
        )
    elif kind == "wildcard":
        exp = expand_wildcard(
            spark, index_dir, pats, meta["n_docs"], max_expansions
        )
    else:
        raise ValueError(f"kind must be prefix|wildcard, got {kind!r}")
    specs = []
    for qid, _pat, k in queries:
        terms = sorted({t for t, _ in exp.get(qid, [])})
        if not terms:
            continue

        def tfp(plmap, _terms=tuple(terms)):
            pls = [plmap[t] for t in _terms if t in plmap]
            return np.unique(np.concatenate(pls)).size if pls else 0

        specs.append(
            {"qid": qid, "required": [], "any": terms, "k": int(k),
             "idf_terms": terms, "tfp": tfp}
        )
    return _run_span_specs(spark, index_dir, specs)
