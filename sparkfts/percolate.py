"""ES percolator: reverse search — store queries, match DOCUMENTS
against them.

In Elasticsearch a ``percolate`` query asks "which of my registered
queries match this document?" — the engine behind saved-search
alerting, category routing, and streaming classification.  The
reference's backend exposes this via the percolator field type on the
same ``client.search`` surface (reference ElasticsearchHandler.py:69).

Spark-first shape (batch percolation — the cluster-scale use: N docs
arriving x M registered queries):

1. Registered queries (``query_id, query_text, mode``) are analyzed
   ONCE on the driver into per-query term sets — the query store is
   user-curated and orders of magnitude smaller than the corpus, so
   the exploded ``(term, query_id, n_terms)`` table broadcasts.
2. Incoming documents tokenize map-side via
   :func:`sparkfts.tokens.tokenize_docs` (one row per DISTINCT
   (doc, term) — tf folding happens in the Arrow batch).
3. One broadcast hash join on ``term`` + one partial-aggregated
   ``groupBy (doc_id, query_id)`` counts matched distinct terms; a
   query matches when the count reaches its requirement
   (``and`` = all terms, ``or`` = at least one,
   ``minimum_should_match`` = at least N).

No shuffle touches corpus-sized data except the final (doc, query)
count — bounded by matches, not by tokens.  This mirrors Lucene's
percolator pre-selection (candidate queries via terms the doc
contains) with the verification step folded into the same join because
our registered grammar (term sets) needs no positional re-check.

Streaming percolation is the same plan over a micro-batch: apply
:func:`percolate` inside ``foreachBatch`` (the query store broadcast
is re-used per batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfts.analysis import tokenize_query


def analyze_queries(
    queries: list[tuple[int, str, str]],
    stopwords: frozenset | None = None,
    stemmer: str | None = None,
) -> list[tuple[int, list[str], int]]:
    """``(query_id, text, mode)`` -> ``(query_id, terms, required)``
    with the engine's pinned analyzer. ``mode`` is ``'and'``, ``'or'``
    or ``'msm:N'`` (minimum_should_match). Queries with no surviving
    terms match nothing (ES: a percolator query that parses to
    match-none)."""
    out = []
    for qid, text, mode in queries:
        terms = sorted(set(tokenize_query(text, stopwords, stemmer)))
        if not terms:
            continue
        if mode == "and":
            req = len(terms)
        elif mode == "or":
            req = 1
        elif mode.startswith("msm:"):
            req = max(1, min(int(mode[4:]), len(terms)))
        else:
            raise ValueError(f"unknown percolate mode {mode!r}")
        out.append((qid, terms, req))
    return out


def percolate(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    stemmer: str | None = None,
) -> DataFrame:
    """Match every doc against every registered query. Returns
    ``(doc_id, query_id)`` for each (document, matching query) pair,
    unordered (callers sort as needed).

    Plan: map-side tokenize -> broadcast join with the exploded query
    term table -> one count-distinct-free groupBy (terms are already
    distinct per (doc, query)).
    """
    from sparkfts.tokens import tokenize_docs

    sw = frozenset(stopwords) if stopwords else None
    analyzed = analyze_queries(queries, sw, stemmer)
    if not analyzed:
        return spark.createDataFrame([], "doc_id long, query_id int")
    qterms = spark.createDataFrame(
        [
            (qid, t, req)
            for qid, terms, req in analyzed
            for t in terms
        ],
        "query_id int, term string, required int",
    )
    toks = tokenize_docs(
        docs, id_col=id_col, text_col=text_col,
        stopwords=stopwords, stemmer=stemmer,
    ).select("doc_id", "term")
    return (
        toks.join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.count("*").alias("n_matched"),
            F.first("required").alias("required"),
        )
        .where(F.col("n_matched") >= F.col("required"))
        .select("doc_id", "query_id")
    )
