"""ES ``nested`` field type: queries and aggregations over arrays of
objects.

ES models one-to-many sub-documents (product variants, link lists, the
reference's per-entity relationship arrays — reference
ElasticsearchToNeo4jSync.py:92-102 walks exactly such parallel nested
lists) as ``nested`` fields: an array of objects where each element is
matched INDEPENDENTLY (the classic cross-matching trap:
``{"a": 1, "b": 2}`` must not match a doc holding ``{a:1,b:9},{a:5,b:2}``).

Spark-first translation: a nested field is an ``array<struct<...>>``
column and every nested operation is a Catalyst higher-order function
— ``exists`` / ``filter`` / ``aggregate`` over the array — evaluated
inside whole-stage codegen with NO explode, NO shuffle and NO Python.
Per-element independence is free: the lambda sees one element at a
time, which is precisely ES's nested-matching contract.

- :func:`nested_query`: docs where >= ``min_matches`` elements satisfy
  the element predicate (ES ``nested`` query; scoring below).
- :func:`nested_score`: ES score_mode ``none|sum|max|min|avg`` folding
  a per-element score expression over the MATCHING elements only.
- :func:`nested_terms_agg`: ES ``nested`` aggregation — buckets over
  an element field, counting ELEMENTS (one explode, then a partial-agg
  groupBy; the only operator here that must explode).
- ``reverse_nested``: the same agg counting PARENT DOCS instead
  (``count(distinct parent)``), ES ``reverse_nested``.

The element predicate / score are SQL expressions over the lambda
variable ``_n`` (e.g. ``"_n.qty >= 30 AND _n.flag = 'R'"``) —
validated fail-loud at plan time by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCORE_MODES = ("none", "sum", "max", "min", "avg")


def _matching(path: str, predicate: str) -> str:
    return f"filter({path}, _n -> ({predicate}))"


def nested_match_count(path: str, predicate: str) -> Column:
    """Column: how many elements of ``path`` satisfy ``predicate``."""
    return F.expr(f"size({_matching(path, predicate)})")


def nested_query(
    df: DataFrame, path: str, predicate: str, min_matches: int = 1
) -> DataFrame:
    """ES nested query: rows where >= ``min_matches`` array elements
    independently satisfy the predicate. Pure rowwise higher-order
    expression — pushes/prunes like any scan filter."""
    if min_matches < 1:
        raise ValueError("min_matches must be >= 1")
    return df.where(nested_match_count(path, predicate) >= min_matches)


def nested_score(
    df: DataFrame,
    path: str,
    predicate: str,
    score_expr: str,
    score_mode: str = "avg",
    alias: str = "score",
) -> DataFrame:
    """ES nested query scoring: fold ``score_expr`` (SQL over ``_n``)
    across the MATCHING elements per score_mode; rows with no matching
    element are dropped (a nested query must match)."""
    if score_mode not in _SCORE_MODES:
        raise ValueError(
            f"score_mode must be one of {_SCORE_MODES}, got {score_mode!r}"
        )
    m = _matching(path, predicate)
    if score_mode == "none":
        col = F.lit(0.0)
    else:
        total = (
            f"aggregate({m}, CAST(0.0 AS DOUBLE), "
            f"(acc, _n) -> acc + CAST(({score_expr}) AS DOUBLE))"
        )
        if score_mode == "sum":
            col = F.expr(total)
        elif score_mode == "avg":
            col = F.expr(total) / F.expr(f"size({m})")
        else:  # max | min
            fn = "greatest" if score_mode == "max" else "least"
            col = F.expr(
                f"aggregate({m}, CAST(NULL AS DOUBLE), (acc, _n) -> "
                f"CASE WHEN acc IS NULL THEN CAST(({score_expr}) AS DOUBLE) "
                f"ELSE {fn}(acc, CAST(({score_expr}) AS DOUBLE)) END)"
            )
    return df.where(
        F.expr(f"size({m})") >= 1
    ).withColumn(alias, col)


def nested_terms_agg(
    df: DataFrame,
    path: str,
    element_field: str,
    predicate: str | None = None,
    size: int = 10,
    reverse_nested: bool = False,
    parent_key: str = "doc_id",
) -> DataFrame:
    """ES ``nested`` aggregation: ``(value, doc_count)`` buckets over an
    element field — counting ELEMENTS by default, or PARENT DOCS with
    ``reverse_nested=True`` (ES reverse_nested). Optional element
    predicate restricts which elements bucket. One explode + one
    partially-aggregated groupBy keyed on bucket cardinality; with
    reverse_nested the distinct-parent count partial-aggregates too."""
    arr = _matching(path, predicate) if predicate else path
    ex = df.select(
        F.col(parent_key).alias("__parent"),
        F.explode(F.expr(arr)).alias("_n"),
    ).select("__parent", F.col(f"_n.{element_field}").alias("value"))
    if reverse_nested:
        agg = ex.groupBy("value").agg(
            F.countDistinct("__parent").alias("doc_count")
        )
    else:
        agg = ex.groupBy("value").agg(F.count("*").alias("doc_count"))
    return agg.orderBy(F.desc("doc_count"), F.asc("value")).limit(size)
