"""ES ``intervals`` query: the positional-grammar front end.

ES's ``intervals`` query composes positional rules — ``match`` (terms
in/out of order within ``max_gaps``), ``any_of`` (alternatives),
``all_of`` (conjunction with its own ordering/gap constraint) — over
the same positional machinery that powers ``match_phrase`` and span
queries. The engine already owns those kernels (sparkfts.phrase's
ordered-greedy slop, sparkfts.spans' pinned unordered window); this
module is the GRAMMAR layer: it validates an ES intervals body
driver-side (fail-loud, before any job) and lowers it onto the
existing batch kernels, so no new scoring semantics are introduced.

Pinned lowering (each documented against its kernel's spec):

- ``{"match": {"query": q, "ordered": true, "max_gaps": g}}``
  -> ordered proximity = ``match_phrase_batch(slop=g)``
  (oracle.phrase ordered-greedy pin; ``g=0`` = exact phrase).
- ``{"match": {..., "ordered": false, "max_gaps": g}}``
  -> pinned unordered window = ``span_near_batch(slop=g,
  in_order=False)`` (sparkfts.spans window-anchor pin).
- ``{"any_of": {"intervals": [...]}}`` -> best-alternative scoring
  (dis_max, tie_breaker 0): each alternative's per-query top-k unions,
  ``max`` per doc, global top-k. Sound for top-k: if a doc's best
  alternative ranks it in the global k, that same alternative ranks it
  in ITS top-k — so the union of per-alternative top-k pages contains
  the global page (the dis_max containment argument).
- ``all_of`` is accepted only with single-term ``match`` leaves, where
  it is exactly one bigger ``match`` (terms concatenated in rule
  order) — ES's common use. Nested combinators beyond that are
  rejected loudly rather than approximated silently.

``max_gaps``: ES default -1 (unbounded) is rejected — unbounded
proximity is a bool AND, not an intervals query; say what you mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _validate_match(body: dict) -> tuple[str, bool, int]:
    if "query" not in body or not str(body["query"]).strip():
        raise ValueError("intervals match needs a non-empty 'query'")
    ordered = bool(body.get("ordered", False))
    g = int(body.get("max_gaps", -1))
    if g < 0:
        raise ValueError(
            "max_gaps must be >= 0 (ES's -1 'unbounded' is a bool AND, "
            "not a positional query — rejected loudly)"
        )
    return str(body["query"]), ordered, g


def _lower(body: dict) -> list[tuple[str, bool, int]]:
    """-> list of (query, ordered, max_gaps) alternatives (len > 1 only
    under any_of)."""
    if not isinstance(body, dict) or len(body) != 1:
        raise ValueError(f"intervals body must be a one-rule dict: {body!r}")
    (rule, spec), = body.items()
    if rule == "match":
        return [_validate_match(spec)]
    if rule == "any_of":
        subs = spec.get("intervals")
        if not subs:
            raise ValueError("any_of needs a non-empty 'intervals' list")
        out = []
        for s in subs:
            out.extend(_lower(s))
        return out
    if rule == "all_of":
        subs = spec.get("intervals")
        if not subs:
            raise ValueError("all_of needs a non-empty 'intervals' list")
        terms = []
        for s in subs:
            if set(s) != {"match"}:
                raise ValueError(
                    "all_of supports single-term match leaves only "
                    "(nested combinators are rejected, not approximated)"
                )
            q, _, _ = _validate_match(
                {**s["match"], "max_gaps": s["match"].get("max_gaps", 0)}
            )
            if len(q.split()) != 1:
                raise ValueError(
                    "all_of leaves must be single terms; put multi-term "
                    "rules in their own match"
                )
            terms.append(q)
        ordered = bool(spec.get("ordered", False))
        g = int(spec.get("max_gaps", -1))
        if g < 0:
            raise ValueError("all_of needs max_gaps >= 0")
        return [(" ".join(terms), ordered, g)]
    raise ValueError(f"unknown intervals rule {rule!r}")


def intervals_topk_batch(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, dict, int]],
) -> DataFrame:
    """ES intervals query batch -> (query_id, rank, doc_id, score).

    Lowers each body to positional-kernel alternatives; alternatives of
    one query batch into ONE kernel pass per (ordered, gaps) group, so
    a grammar with many branches still costs one postings scan per
    distinct proximity mode.
    """
    from sparkfts.phrase import match_phrase_batch
    from sparkfts.spans import span_near_batch

    # (qid, alternative) pairs, grouped by kernel signature
    plans: dict[tuple[bool, int], list[tuple[int, str, int]]] = {}
    alt_of: dict[int, int] = {}
    n = 0
    for qid, body, k in queries:
        for q, ordered, g in _lower(body):
            plans.setdefault((ordered, g), []).append((n, q, k))
            alt_of[n] = qid
            n += 1
    if not plans:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, score double"
        )
    parts: list[DataFrame] = []
    for (ordered, g), batch in sorted(plans.items()):
        res = (
            match_phrase_batch(spark, index_dir, batch, slop=g)
            if ordered
            else span_near_batch(
                spark, index_dir, batch, slop=g, in_order=False
            )
        )
        parts.append(res.select("query_id", "doc_id", "score"))
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    amap = F.create_map(
        *[F.lit(x) for kv in alt_of.items() for x in kv]
    )
    ks = {qid: k for qid, _, k in queries}
    kmap = F.create_map(*[F.lit(x) for kv in ks.items() for x in kv])
    merged = (
        allp.withColumn("query_id", amap[F.col("query_id")])
        .groupBy("query_id", "doc_id")
        .agg(F.max("score").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= kmap[F.col("query_id")])
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )
