"""Edit-distance helpers for fuzzy expansion joins.

Plain Levenshtein stays JVM-side (``F.levenshtein`` in the join
condition — the hot path). ES's default fuzzy semantics, however, count
a transposition as ONE edit (``fuzzy_transpositions: true``,
Damerau-Levenshtein); Spark has no built-in for that, so the
transpositions path keeps the JVM join as a PRE-FILTER and refines the
tiny survivor set:

- length window  ``|len(t) - len(q)| <= maxd``  (dam >= length diff)
- ``F.levenshtein(t, q) <= 2 * maxd``  (a transposition costs 2 plain
  edits and every other op costs 1, so lev <= 2 * dam; hence
  dam <= maxd  ⇒  lev <= 2 * maxd — a sound JVM-evaluable superset)
- exact unrestricted Damerau (``oracle.fuzzy.damerau_levenshtein``,
  DuckDB-identical) on the survivors — via an Arrow-batched pandas UDF
  when the survivors stay distributed, or driver-side when the
  expansion set is collected anyway.

Survivor cardinality is (query terms) x (dictionary terms inside the
length window passing the 2*maxd lev filter) — for AUTO:3,6 distances
that is a few hundred pairs per term even on web-scale dictionaries,
so the Python refinement is never the bottleneck.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("int")
def damerau_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) unrestricted Damerau-Levenshtein."""
    from oracle.fuzzy import damerau_levenshtein

    return pd.Series(
        [damerau_levenshtein(x, y) for x, y in zip(a, b)], dtype="int32"
    )


def fuzzy_join_cond(maxd_col: str = "maxd", transpositions: bool = False):
    """JVM-side join condition between a dictionary ``term`` column and a
    broadcast query frame carrying (q_term, maxd, qlen).

    With transpositions the lev bound relaxes to 2*maxd (sound superset,
    see module docstring); the caller must refine with ``damerau_udf``
    or a driver-side exact pass.
    """
    length_ok = F.abs(F.length("term") - F.col("qlen")) <= F.col(maxd_col)
    lev = F.levenshtein(F.col("term"), F.col("q_term"))
    if transpositions:
        return length_ok & (lev <= 2 * F.col(maxd_col))
    return length_ok & (lev <= F.col(maxd_col))
