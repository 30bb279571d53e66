"""ES parent-child joins: ``has_child`` / ``has_parent`` / ``inner_hits``.

The reference's data model is itself parent-child shaped — each synced
entity carries nested relationship targets that become Neo4j edges
(reference ElasticsearchToNeo4jSync.py:92-102 walks `propMap` pairs per
parent document) — and the ES backend it delegates to (reference
ElasticsearchHandler.py:69) exposes that shape to queries through the
``join`` field type:

- ``has_child``: return PARENT docs having at least one child matching
  an inner query. ``score_mode`` folds the matching children's scores
  into the parent: ``none`` (constant 0 in ES; we pin 0.0), ``sum``,
  ``max``, ``min``, ``avg``. ``min_children`` / ``max_children`` bound
  the number of matching children a parent must have.
- ``has_parent``: return CHILD docs whose parent matches an inner
  query. ``score=False`` → constant; ``score=True`` → the parent's
  score is propagated to every child (ES's score mode for has_parent).
- ``inner_hits``: alongside each surviving parent, the top-N matching
  children that made it match.

Spark-first execution model. ES forces children onto the parent's
shard (``routing=parent``) so the join is always shard-local; the
Spark analogue is a hash-partitioned join on the join key — when both
tables are bucketed/pre-partitioned by the key the exchange disappears
entirely, which is exactly ES's colocation. The plan is:

1. the child filter is a plain Catalyst predicate → pushed into the
   child scan (PushedFilters; only matching children leave the scan),
2. ``groupBy(child_key)`` with map-side partial aggregation reduces the
   child side to ONE row per parent key BEFORE the join exchange —
   the shuffled payload is bounded by distinct parent keys, not by
   child rows (the ES shard-local fold, expressed declaratively),
3. a single equi-join against the parents (AQE may elect broadcast
   when the aggregated side is small).

Nothing here needs a UDF and nothing collects; the whole operator is
three Catalyst nodes that survive a 100x scale-up as long as the join
key isn't pathologically skewed (AQE skew-join handles the rest).

Ties pinned: score desc → parent/child key asc (ES order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCORE_MODES = ("none", "sum", "max", "min", "avg")


def _as_col(expr: str | Column) -> Column:
    return expr if isinstance(expr, Column) else F.expr(expr)


def has_child(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    child_filter: str | Column,
    score_mode: str = "none",
    score_expr: str | Column | None = None,
    min_children: int = 1,
    max_children: int | None = None,
) -> DataFrame:
    """Parents having >= ``min_children`` children matching the filter.

    Returns the parent rows plus ``child_count`` (long) and ``score``
    (double; 0.0 under ``score_mode='none'``, else the fold of
    ``score_expr`` over the MATCHING children — ES folds only the
    children the inner query matched, never all children).
    """
    if score_mode not in _SCORE_MODES:
        raise ValueError(
            f"score_mode must be one of {_SCORE_MODES}, got {score_mode!r}"
        )
    if score_mode != "none" and score_expr is None:
        raise ValueError("score_expr is required unless score_mode='none'")
    if min_children < 1:
        raise ValueError("min_children must be >= 1 (ES requires a match)")
    if max_children is not None and max_children < min_children:
        raise ValueError("max_children must be >= min_children")

    matched = children.where(_as_col(child_filter))
    aggs = [F.count(F.lit(1)).alias("child_count")]
    if score_mode == "none":
        aggs.append(F.lit(0.0).alias("score"))
    else:
        fold = {"sum": F.sum, "max": F.max, "min": F.min, "avg": F.avg}[
            score_mode
        ]
        aggs.append(
            fold(_as_col(score_expr).cast("double")).alias("score")
        )
    per_parent = matched.groupBy(
        F.col(child_key).alias("__join_key")
    ).agg(*aggs)
    per_parent = per_parent.where(F.col("child_count") >= min_children)
    if max_children is not None:
        per_parent = per_parent.where(F.col("child_count") <= max_children)
    return parents.join(
        per_parent, parents[parent_key] == per_parent["__join_key"]
    ).drop("__join_key")


def has_parent(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    parent_filter: str | Column,
    score: bool = False,
    score_expr: str | Column | None = None,
) -> DataFrame:
    """Children whose parent matches the filter.

    With ``score=True`` the parent's ``score_expr`` value is propagated
    to every child as ``score`` (ES has_parent score mode); otherwise
    ``score`` is the pinned constant 0.0. The parent side is filtered
    and projected to (key, score) BEFORE the join, so the exchange
    carries two columns per matching parent — broadcastable whenever
    the matching parent set is small (AQE decides).
    """
    if score and score_expr is None:
        raise ValueError("score_expr is required when score=True")
    matched = parents.where(_as_col(parent_filter))
    sc = (
        _as_col(score_expr).cast("double") if score else F.lit(0.0)
    ).alias("score")
    keys = matched.select(F.col(parent_key).alias("__join_key"), sc)
    return children.join(
        keys, children[child_key] == keys["__join_key"]
    ).drop("__join_key")


def has_child_inner_hits(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    child_filter: str | Column,
    score_expr: str | Column,
    n_parents: int = 10,
    n_hits: int = 3,
    child_tiebreak: str | None = None,
) -> DataFrame:
    """Top ``n_parents`` parents by summed child score, each with its
    top ``n_hits`` matching children (ES ``inner_hits``).

    Two bounded windows, both PARTITIONED: children rank inside their
    parent key (per-key state only, no global funnel), parents rank by
    the aggregated score with the global window applied AFTER the
    aggregation reduced the frame to one row per parent — the ES
    query-then-fetch shape. Returns one row per (parent, child hit):
    ``(parent key, parent_rank, parent score, hit_rank, child cols)``.
    """
    matched = children.where(_as_col(child_filter)).withColumn(
        "__cscore", _as_col(score_expr).cast("double")
    )
    tiebreak = [F.col(c) for c in (child_tiebreak.split(",") if child_tiebreak else [])]
    w_child = Window.partitionBy(child_key).orderBy(
        F.col("__cscore").desc(), *tiebreak
    )
    hits = matched.withColumn("hit_rank", F.row_number().over(w_child))

    per_parent = matched.groupBy(
        F.col(child_key).alias("__join_key")
    ).agg(F.sum("__cscore").alias("parent_score"))
    # distributed TakeOrdered bounds the frame to n_parents rows FIRST;
    # the rank window then runs over <= n_parents rows (never a global
    # single-task sort of all parent keys)
    w_parent = Window.orderBy(
        F.col("parent_score").desc(), F.col("__join_key").asc()
    )
    top = (
        per_parent.orderBy(
            F.col("parent_score").desc(), F.col("__join_key").asc()
        )
        .limit(n_parents)
        .withColumn("parent_rank", F.row_number().over(w_parent))
    )
    # carry the parent doc's columns (ES returns the parent hit plus its
    # inner child hits); `top` is <= n_parents rows, so both joins
    # broadcast
    top = top.join(
        parents, top["__join_key"] == parents[parent_key]
    )
    out = hits.where(F.col("hit_rank") <= n_hits).join(
        F.broadcast(top), F.col(child_key) == F.col("__join_key")
    )
    return out.drop("__join_key", "__cscore")


def children_scope(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    parent_filter: str | Column,
) -> DataFrame:
    """ES ``children`` AGGREGATION scope switch: the child documents
    of the parents matching ``parent_filter`` — the frame any sub-
    aggregation (terms / stats / histogram...) then runs over, exactly
    how ES nests sub-aggs inside ``children``.

    Plan: the parent side is filtered + projected to its key and
    DISTINCT'd before a ``left_semi`` join into the child table — the
    exchange carries one column per matching parent (broadcastable;
    AQE decides), the child scan keeps its pushed filters, and no child
    row is duplicated or widened. ES's equivalent is a shard-local
    ordinal lookup (children are routed to the parent's shard); the
    semi-join on a co-partitioned/bucketed key is the same
    colocation."""
    keys = (
        parents.where(_as_col(parent_filter))
        .select(F.col(parent_key).alias("__jk"))
        .distinct()
    )
    return children.join(
        keys, children[child_key] == keys["__jk"], "left_semi"
    )


def parent_scope(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    child_filter: str | Column,
) -> DataFrame:
    """ES ``parent`` AGGREGATION scope switch (the ``children``
    inverse): the DISTINCT parent documents having at least one child
    matching ``child_filter`` — each parent counted ONCE no matter how
    many children matched (the ES join-field dedup), ready for any
    sub-aggregation.

    Plan: child filter pushed into the child scan, child side reduced
    to distinct keys (map-side partial) before the semi-join into the
    parent table."""
    keys = (
        children.where(_as_col(child_filter))
        .select(F.col(child_key).alias("__jk"))
        .distinct()
    )
    return parents.join(
        keys, parents[parent_key] == keys["__jk"], "left_semi"
    )
