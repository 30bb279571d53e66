"""Query compilation: cloud event -> typed Query IR -> Spark execution.

Plane-A parity with the reference's ``elasticsearchQueryBuilder``
(reference ElasticsearchToNeo4jSync.py:74-107), re-expressed as a typed IR
instead of an Elasticsearch DSL dict:

- consumes the query cloud event shape
  ``{"searchQueries": [{"properties": [{"subject": s, "value": v}]}]}``
  (reference ElasticsearchToNeo4jSync.py:90, README.md:82-88);
- keeps only properties whose ``subject`` is in the configured allow-list
  (default ``['name']``, reference ElasticsearchToNeo4jSync.py:26,100);
- lowercases each value (reference ElasticsearchToNeo4jSync.py:94) — our
  pinned analyzer re-lowercases anyway, so this is a no-op by construction;
- one conjunctive fuzzy clause per kept property
  (``multi_match(operator="and", fuzziness="AUTO")``,
  reference ElasticsearchToNeo4jSync.py:92-99), deduped field list
  (reference ElasticsearchToNeo4jSync.py:89);
- all clauses AND-ed (``bool.must``, reference
  ElasticsearchToNeo4jSync.py:102); zero clauses -> match-all
  (the reference returns ``{}``, which ES treats as match_all);
- malformed event -> ``None`` (reference ElasticsearchToNeo4jSync.py:103-105).

Also ports ``equalizeListValues`` (reference
ElasticsearchToNeo4jSync.py:61-71), the config canonicalizer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_PROPERTIES = ("name",)
DEFAULT_FIELDS = ("text",)


def equalize_list_values(data: dict) -> dict:
    """Pad every list value to the longest list's length by repeating its
    first element; non-list values pass through unchanged.

    Parity with the reference's config canonicalizer (reference
    ElasticsearchToNeo4jSync.py:61-71): parallel config lists are padded so
    they zip cleanly. Pure function (the reference mutates in place).
    """
    lists = {k: v for k, v in data.items() if isinstance(v, list)}
    if not lists:
        return dict(data)
    target = max(len(v) for v in lists.values())
    out = dict(data)
    for k, v in lists.items():
        if v and len(v) < target:
            out[k] = v + [v[0]] * (target - len(v))
    return out


@dataclass(frozen=True)
class Clause:
    """One fuzzy full-text clause (one ``multi_match``); ``operator``
    combines the clause's own terms (and = conjunctive, or = any);
    ``fuzziness="AUTO"`` expands terms ES-style (length ladder),
    ``"1"``/``"2"`` pin a FIXED max edit distance (ES fixed
    fuzziness), ``"0"`` pins exact."""

    query: str
    fields: tuple[str, ...] = DEFAULT_FIELDS
    operator: str = "and"
    fuzziness: str = "AUTO"
    # ES multi_match tie_breaker (dis_max): combined field score =
    # best_field + tie_breaker * sum(other matching fields). 0.0 = pure
    # best_fields (the ES default the reference relies on).
    tie_breaker: float = 0.0
    # ES query-level boost: multiplies this clause's score (applied
    # once, AFTER the clause's own fold — the Lucene BoostQuery pin).
    boost: float = 1.0


@dataclass(frozen=True)
class Bool:
    """A nested ES ``bool`` node (full grammar): members of must /
    should / must_not are :class:`Clause`, :class:`Bool` or
    :class:`DisMax`. Semantics pinned in :mod:`sparkfts.booltree`
    (single-pass kernel)."""

    must: tuple = field(default_factory=tuple)
    should: tuple = field(default_factory=tuple)
    must_not: tuple = field(default_factory=tuple)
    # ES bool-level boost (BoostQuery around the whole bool)
    boost: float = 1.0
    # ES bool.minimum_should_match (full value grammar — int, negative,
    # "P%", "N<spec"; sparkfts.wand.parse_minimum_should_match). None =
    # the ES default: 0 with must present (should is pure bonus), else
    # 1. With a value, a doc must match >= that many should members
    # even when must clauses are present; a requirement above
    # len(should) is unsatisfiable (Lucene BooleanQuery), and the
    # option is ignored when there are no should clauses (ES behavior).
    minimum_should_match: int | str | None = None
    # ES bool.filter at ANY nesting level (round 5): SQL predicates
    # over docmap doc-value columns; each constrains THIS node's match
    # set with zero scoring contribution (a zero-scoring must member in
    # the kernel — booltree "docset" nodes). The ROOT query filter
    # stays SearchRequest.filter_expr (the include-mask fast path).
    filter: tuple = field(default_factory=tuple)


@dataclass(frozen=True)
class DisMax:
    """ES ``dis_max`` query: matches docs matching ANY member query;
    score = best member score + ``tie_breaker`` * (sum of the OTHER
    matching member scores). ``tie_breaker=0`` (the ES default) is pure
    best-of. Members are :class:`Clause`, :class:`Bool` or nested
    :class:`DisMax`; evaluated in the same single-pass bool-tree kernel
    (:mod:`sparkfts.booltree`). Pinned fold: the member-score sum
    accumulates in member order (float64), and the combined score is
    computed as ``best + tie_breaker * (total - best)``."""

    queries: tuple = field(default_factory=tuple)
    tie_breaker: float = 0.0
    # ES query-level boost (BoostQuery around the dis_max)
    boost: float = 1.0


@dataclass(frozen=True)
class Prefix:
    """ES ``prefix`` query as a bool-tree LEAF: matches docs containing
    any dictionary term starting with ``prefix`` (term-level — the
    prefix is lowercased but NOT analyzed, matching
    :func:`sparkfts.prefix.prefix_topk_batch`). Scored as one
    best-expansion-wins group (``max`` over expansions of
    ``idf * tf_norm * (k1+1)`` — the exact pin of
    :mod:`sparkfts.prefix`), so a :class:`Prefix` leaf inside a
    :class:`Bool` scores identically to the standalone prefix query.
    ``fields`` follows :class:`Clause` (boost specs under a multi-field
    index; ignored on a single-field index)."""

    prefix: str
    fields: tuple = DEFAULT_FIELDS
    boost: float = 1.0


@dataclass(frozen=True)
class Wildcard:
    """ES ``wildcard`` query as a bool-tree LEAF (``*`` = any sequence,
    ``?`` = one char; term-level: pattern lowercased, never analyzed).
    Scored best-expansion-wins over the dictionary expansion — the
    :func:`sparkfts.prefix.wildcard_topk_batch` pin, bit-identical to
    the standalone query."""

    pattern: str
    fields: tuple = DEFAULT_FIELDS
    boost: float = 1.0


@dataclass(frozen=True)
class Regexp:
    """ES ``regexp`` query as a bool-tree LEAF (implicitly anchored,
    validated subset — :func:`sparkfts.prefix.validate_regexp`; case
    PRESERVED, matching the standalone path's ``lower_patterns=False``
    pin). Scored best-expansion-wins over the dictionary expansion."""

    pattern: str
    fields: tuple = DEFAULT_FIELDS
    boost: float = 1.0


@dataclass(frozen=True)
class FuzzyTerm:
    """ES ``fuzzy`` query as a bool-tree LEAF: TERM-level fuzzy match —
    the term is lowercased but NEVER analyzed (unlike a fuzzy
    :class:`Clause`, whose text runs the analyzer chain; under a
    stemmer the two differ, exactly as ES ``fuzzy`` vs fuzzy ``match``
    differ). ``fuzziness``: "AUTO" (length ladder) / "0" / "1" / "2".
    Pinned to plain-Levenshtein expansion (the engine default; ES
    defaults ``fuzzy_transpositions: true`` — the Damerau path lives on
    the dedicated surface, :func:`sparkfts.query.
    bm25_index_fuzzy_batch`)."""

    term: str
    fuzziness: str = "AUTO"
    fields: tuple = DEFAULT_FIELDS
    boost: float = 1.0


@dataclass(frozen=True)
class ConstFilter:
    """ES ``constant_score`` over a FILTER-CONTEXT predicate as a
    bool-tree leaf: every doc satisfying the docmap SQL ``predicate``
    matches with score exactly ``boost`` (the ES/Lucene
    ConstantScoreQuery pin). Rides the same per-predicate allowed-set
    machinery as nested ``bool.filter`` (booltree "docset" nodes) —
    one docmap scan per distinct predicate. Text-query
    ``constant_score`` has its own surface
    (:func:`sparkfts.scoring.constant_score_topk`)."""

    predicate: str
    boost: float = 1.0


@dataclass(frozen=True)
class SearchRequest:
    """Typed IR for one search: AND of clauses; no clauses = match-all.

    ``filter_expr``: ES ``bool.filter`` — a non-scoring SQL predicate
    over docmap columns restricting the result doc set (idf/avgdl stay
    corpus-global, per ES).
    ``must_not``: ES ``bool.must_not`` — query texts whose matching docs
    are excluded (no scoring contribution).
    """

    clauses: tuple[Clause, ...] = field(default_factory=tuple)
    k: int = 10  # ES default size the reference relies on
    # (reference ElasticsearchHandler.py:52-74: no size/sort passed)
    filter_expr: str | None = None
    must_not: tuple[str, ...] = field(default_factory=tuple)
    # ES bool.should: optional scoring clauses. With must clauses
    # present they never constrain matching — a matching should clause
    # just ADDS its score. With no must clauses, ES requires at least
    # one should to match (minimum_should_match=1) and the score is the
    # sum of the matching should scores.
    should: tuple[Clause, ...] = field(default_factory=tuple)

    @property
    def is_match_all(self) -> bool:
        return not self.clauses and not self.should


def build_search_request(
    cloud_event: dict,
    properties: tuple[str, ...] = DEFAULT_PROPERTIES,
    fields: tuple[str, ...] = DEFAULT_FIELDS,
    k: int = 10,
) -> SearchRequest | None:
    """Cloud event -> :class:`SearchRequest`; ``None`` on a malformed event."""
    try:
        clauses = []
        # dedupe fields preserving determinism: sorted like the reference's
        # list(set(...)) intent (reference ElasticsearchToNeo4jSync.py:89)
        fset = tuple(sorted(set(fields)))
        for search_query in cloud_event["searchQueries"]:
            for prop in search_query["properties"]:
                if prop.get("subject") in properties:
                    clauses.append(
                        Clause(query=str(prop["value"]).lower(), fields=fset)
                    )
        return SearchRequest(clauses=tuple(clauses), k=k)
    except (KeyError, TypeError):
        return None


# ---------------------------------------------------------------------------
# Execution
# ---------------------------------------------------------------------------


def match_all_topk(docs: DataFrame, k: int = 10) -> DataFrame:
    """Match-all: every doc scores 1.0; order = doc_id asc (pinned stand-in
    for ES internal doc order) -> DataFrame(rank, doc_id, score).

    Scale note: ``orderBy(doc_id).limit(k)`` is a TakeOrdered — per-
    partition top-k then a k-row merge on the driver; no full sort.
    """
    return (
        docs.select(F.col("doc_id").cast("long"))
        .orderBy("doc_id")
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy("doc_id")),
        )
        .select("rank", "doc_id", F.lit(1.0).alias("score"))
    )


def ids_topk(docs: DataFrame, ids: list[int], k: int = 10) -> DataFrame:
    """ES ``ids`` query: filter-context fetch of the documents whose
    ``_id`` is in the request list — every hit scores 1.0 (constant
    filter score), order pinned doc_id asc (the match_all pin)
    -> DataFrame(rank, doc_id, score).

    The id list is request-sized, so it rides the plan as an in-list
    literal — at any corpus scale this is a pushed-down ``IN``
    predicate on the storage scan (min/max + dictionary pruning),
    never a join."""
    if not ids:
        raise ValueError("ids must be non-empty")
    return (
        docs.select(F.col("doc_id").cast("long"))
        .where(F.col("doc_id").isin([int(i) for i in ids]))
        .orderBy("doc_id")
        .limit(int(k))
        .withColumn("rank", F.row_number().over(Window.orderBy("doc_id")))
        .select("rank", "doc_id", F.lit(1.0).alias("score"))
    )


def exists_topk(docs: DataFrame, field: str, k: int = 10) -> DataFrame:
    """ES ``exists`` query: filter-context match of documents that
    HAVE any value for ``field`` (pinned: SQL ``IS NOT NULL`` — ES
    also treats explicit nulls / empty arrays as missing, which is
    exactly what a typed null column carries here). Score 1.0, order
    doc_id asc -> DataFrame(rank, doc_id, score).

    Composes with scored queries through ``filter_expr`` ("<field> IS
    NOT NULL") on the standard filtered top-k path; this standalone
    form is the bare-exists request. The null test is a pushed-down
    scan predicate (parquet null-count pruning applies)."""
    return (
        docs.select(F.col("doc_id").cast("long"), F.col(field))
        .where(F.col(field).isNotNull())
        .orderBy("doc_id")
        .limit(int(k))
        .withColumn("rank", F.row_number().over(Window.orderBy("doc_id")))
        .select("rank", "doc_id", F.lit(1.0).alias("score"))
    )


def run_search_request_indexed(
    spark,
    index_dir: str,
    request: SearchRequest,
    multifield: bool = False,
) -> DataFrame:
    """Execute a :class:`SearchRequest` against a BUILT index ->
    DataFrame(rank, doc_id, score) — the end-to-end production shape of
    the reference's query path (cloud event -> IR -> fuzzy multi_match
    clauses AND-ed by ``bool.must``). Identical results to
    :func:`run_search_request` over the same corpus (tested).

    All non-match-all requests run through the single-pass bool-tree
    kernel (:mod:`sparkfts.booltree`): every clause of the request is
    scored inside ONE shard-kernel pass (per-shard top-k, global window
    over <= n_shards*k rows) instead of materializing per-clause
    complete match sets merged on an unpartitioned window.

    ``multifield=True`` treats ``index_dir`` as a multi-field index and
    honors each clause's ``fields`` list (ES-style boost specs allowed,
    best-fields combination); otherwise the single analyzed field
    answers every clause.
    """
    from pyspark.sql import functions as F

    if request.is_match_all:
        from sparkfts.index import load_docmap

        if multifield:
            from sparkfts.multifield import field_dir, read_mf_meta

            mf = read_mf_meta(index_dir)
            docs = load_docmap(
                spark, field_dir(index_dir, mf["fields"][0])
            )
        else:
            docs = load_docmap(spark, index_dir)
        if request.filter_expr:
            docs = docs.where(F.expr(request.filter_expr))
        docs = docs.select("doc_id")
        if request.must_not:
            from sparkfts.aggs import match_docs_batch

            if multifield:
                from functools import reduce

                from sparkfts.multifield import field_dir, read_mf_meta

                mf = read_mf_meta(index_dir)
                parts = [
                    match_docs_batch(
                        spark,
                        field_dir(index_dir, fld),
                        list(enumerate(request.must_not)),
                        mode="or",
                    )
                    for fld in mf["fields"]
                ]
                mn = reduce(lambda a, b: a.unionByName(b), parts)
            else:
                mn = match_docs_batch(
                    spark, index_dir, list(enumerate(request.must_not)),
                    mode="or",
                )
            docs = docs.join(
                mn.select("doc_id").distinct(), "doc_id", "left_anti"
            )
        return match_all_topk(docs, request.k)

    from sparkfts.booltree import bool_topk_batch

    return bool_topk_batch(
        spark, index_dir, [request], multifield=multifield
    ).select("rank", "doc_id", "score")


def run_search_request(
    tokens: DataFrame,
    docs: DataFrame,
    request: SearchRequest,
    n_docs: int,
    avgdl: float,
) -> DataFrame:
    """Execute a :class:`SearchRequest` -> DataFrame(rank, doc_id, score).

    ``bool.must`` semantics (reference ElasticsearchToNeo4jSync.py:102):
    a doc qualifies iff EVERY clause matches it; its score is the sum of
    clause scores (folded in clause-index order, deterministic float64).
    Each clause runs with the pinned fuzzy-AND semantics
    (:mod:`sparkfts.fuzzy`); all clauses execute in ONE Spark plan via the
    batch API (clause index = query_id).
    """
    from sparkfts.fuzzy import bm25_fuzzy_scan_batch

    def _bool_joins(df: DataFrame) -> DataFrame:
        """Scan-path bool.filter / bool.must_not: filter predicate runs
        over the docs table; the must_not match set comes from the tokens
        table (OR over the negated queries' analyzed terms)."""
        if request.filter_expr:
            df = df.join(
                docs.where(F.expr(request.filter_expr)).select("doc_id"),
                "doc_id",
                "left_semi",
            )
        if request.must_not:
            from sparkfts.analysis import tokenize_query

            mn_terms = sorted(
                {t for q in request.must_not for t in tokenize_query(q)}
            )
            if mn_terms:
                df = df.join(
                    tokens.where(F.col("term").isin(mn_terms))
                    .select("doc_id")
                    .distinct(),
                    "doc_id",
                    "left_anti",
                )
        return df

    def _scan_clauses(clauses) -> DataFrame:
        """One batched plan per distinct clause operator (honoring
        ``Clause.operator`` — previously hardcoded 'and')."""
        from functools import reduce

        parts = [
            bm25_fuzzy_scan_batch(
                tokens,
                [
                    (i, c.query, n_docs)
                    for i, c in enumerate(clauses)
                    if c.operator == op
                ],
                n_docs,
                avgdl,
                mode=op,
            )
            for op in sorted({c.operator for c in clauses})
        ]
        return reduce(lambda a, b: a.unionByName(b), parts)

    def _should_scores() -> DataFrame:
        per = _scan_clauses(request.should)
        return per.groupBy("doc_id").agg(
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(F.col("query_id"), F.col("score"))
                        )
                    ),
                    lambda x: x["score"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("should_score")
        )

    if request.is_match_all:
        return match_all_topk(_bool_joins(docs.select("doc_id")), request.k)

    if not request.clauses:
        # pure-should: minimum_should_match=1, score = sum of matching
        # should clause scores
        scored = _bool_joins(
            _should_scores().select(
                "doc_id", F.col("should_score").alias("score")
            )
        )
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.lit(request.k))
            .select("rank", "doc_id", "score")
            .orderBy("rank")
        )

    # per-clause k = n_docs: need ALL matching docs before the must-join
    # (the scan path IS the full-corpus baseline; the indexed path's
    # single-pass kernel is the scale shape)
    per_clause = _scan_clauses(request.clauses)
    n_clauses = len(request.clauses)
    merged = (
        per_clause.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_clauses_matched"),
            F.sort_array(
                F.collect_list(F.struct(F.col("query_id"), F.col("score")))
            ).alias("parts"),
        )
        .where(F.col("n_clauses_matched") == F.lit(n_clauses))
        .withColumn(
            "score",
            F.aggregate(
                F.transform(F.col("parts"), lambda x: x["score"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    merged = _bool_joins(merged)
    if request.should:
        merged = (
            merged.join(_should_scores(), "doc_id", "left")
            .withColumn(
                "score",
                F.col("score")
                + F.coalesce(F.col("should_score"), F.lit(0.0)),
            )
            .drop("should_score")
        )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(request.k))
        .select("rank", "doc_id", "score")
        .orderBy("rank")
    )
