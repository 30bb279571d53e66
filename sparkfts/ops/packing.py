"""Sequence packing manifest: concat-then-chunk token-stream layout.

The standard pretraining data layout (GPT-style): documents are
concatenated in a pinned order and the token stream is cut into
fixed-capacity context windows; a doc may span a chunk boundary. This
op emits the MANIFEST — where every doc lands in that stream — which
is what a training-data pipeline actually materializes (the tensor
writer then follows it).

Pinned spec (mirrored by the DuckDB oracle in
``__spark_entry__.pack_manifest``):

- order: doc_id ascending; docs with zero analyzer tokens are dropped
  (they contribute nothing to the stream);
- ``start_offset`` = exclusive prefix sum of token counts in that
  order; ``first_chunk = start_offset // capacity``;
  ``last_chunk = (start_offset + n_tokens - 1) // capacity``.

Scale shape — a global ordered cumsum WITHOUT a single-partition
window (the two-phase prefix-sum): docs bucket into ORDERED doc_id
ranges computed from the exact (min, max) ids — deterministic integer
arithmetic, not repartitionByRange's sampled boundaries, so the
range id survives recomputation of a lazy plan; each range computes
its local exclusive cumsum (window keyed on the range id); the
per-range totals (one scalar per range) come back to the driver and
their own prefix sums are added back as a broadcast literal map. Two
bounded jobs; window state never exceeds one range. sha1 doc ids are
uniform over [0, 2^63), so ranges balance at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkfts.ops.textstats import tokens_col
from sparkfts.session import session_cores


def pack_manifest(
    docs: DataFrame,
    capacity: int = 2048,
    text_col: str = "text",
    n_ranges: int | None = None,
) -> DataFrame:
    """-> (doc_id, n_tokens, start_offset, first_chunk, last_chunk),
    doc_id asc. See module docstring for the pinned layout."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    spark = docs.sparkSession
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)

    empty = (
        "doc_id long, n_tokens long, start_offset long, "
        "first_chunk long, last_chunk long"
    )
    bounds = base.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return spark.createDataFrame([], empty)
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    nr = max(1, int(n_ranges or session_cores(spark)))
    width = max(1, (hi - lo) // nr + 1)  # python ints: no overflow
    rid = F.expr(f"(doc_id - {lo}) div {width}").cast("int").alias("rid")
    ranged = base.select("doc_id", "n_tokens", rid)

    totals = sorted(
        (int(r["rid"]), int(r["t"]))
        for r in ranged.groupBy("rid")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )
    prefix: dict[int, int] = {}
    acc = 0
    for r, t in totals:
        prefix[r] = acc
        acc += t
    from sparkfts.index import lit_map

    pmap = lit_map(prefix.items())
    w = (
        Window.partitionBy("rid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
        + F.element_at(pmap, F.col("rid"))
    ).alias("start_offset")
    return (
        ranged.select("doc_id", "n_tokens", start)
        .select(
            "doc_id",
            "n_tokens",
            "start_offset",
            F.expr(f"start_offset div {int(capacity)}").alias("first_chunk"),
            F.expr(
                f"(start_offset + n_tokens - 1) div {int(capacity)}"
            ).alias("last_chunk"),
        )
        .orderBy("doc_id")
    )
