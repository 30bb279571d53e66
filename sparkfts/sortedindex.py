"""ES index sorting + early termination (``index.sort`` /
``track_total_hits: false``).

ES lets an index declare a sort (``index.sort.field``); segments then
store documents IN that order, and a query sorting the same way stops
scanning each segment after ``k`` hits — "latest N pages" costs O(k)
per shard no matter how big the corpus is. That query is the single
most common one on a time-ordered web corpus.

Spark-first translation:

- **Build**: a sidecar table ``dvsort_<field>/`` holding
  ``(doc_id, <field>)`` repartitioned by shard and
  ``sortWithinPartitions`` on ``(<field> dir, doc_id)``, written with
  small ``maxRecordsPerFile``-independent row groups. The docmap
  itself stays doc_id-ordered (every scoring kernel's searchsorted
  contract is untouched); the sidecar is two columns — at 10^12 docs
  it is ~1% of the index.
- **Query** (:func:`sorted_topk`): any doc-value predicate is applied
  JVM-side first (Catalyst pushes it into the parquet scan), then a
  ``mapInPandas`` kernel takes the FIRST ``k`` surviving rows of each
  input split and RETURNS — Spark stops feeding Arrow batches the
  moment the generator stops consuming, so unread row groups are
  never decoded or even fetched. A split is a contiguous file range,
  so its first ``k`` rows are a superset-safe candidate set; the
  global ``orderBy().limit(k)`` (TakeOrdered over
  ``<= n_splits * k`` rows) finishes the merge exactly.

Tombstones are excluded inside the kernel BEFORE counting ``k``
(delete-visibility contract shared with every query path). The
sidecar snapshots the docmap at build time: rebuild it after streamed
appends or merges (cheap — one sort of two columns), same lifecycle
rule as the LM sidecars.

Ties pinned: sort value (asc|desc) then doc_id asc — identical to
``docvalues.sort_by_field_batch``, which stays the generic path for
fields without a sidecar.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SORT_META = "_dvsort.json"


def _sidecar_dir(index_dir: str, field: str) -> str:
    return os.path.join(index_dir, f"dvsort_{field}")


def write_sorted_docvalues(
    spark: SparkSession,
    index_dir: str,
    field: str,
    ascending: bool = False,
) -> str:
    """Materialize the sort sidecar for ``field`` (must be one of the
    index's docvalue columns). Overwrites any previous sidecar for the
    field; returns its path."""
    from sparkfts.index import load_docmap, read_meta
    from sparkfts.storage import write_table

    meta = read_meta(index_dir)
    if field not in (meta.get("docvalue_cols") or []):
        raise ValueError(
            f"{field!r} is not a docvalue column of this index "
            f"(have {meta.get('docvalue_cols')})"
        )
    # carry ALL docvalue columns: filters on them then push into the
    # sidecar scan (column pruning keeps untouched ones unread)
    dv = list(meta.get("docvalue_cols") or [])
    dm = load_docmap(spark, index_dir).select("doc_id", *dv, "shard")
    # partition column FIRST in the sort: the dynamic-partition writer
    # adds its own (unstable) sort unless the incoming ordering already
    # leads with the partition columns (same convention as the postings
    # write) — file order inside each shard dir must BE the sort order.
    order = [
        F.col("shard").asc(),
        F.col(field).asc() if ascending else F.col(field).desc(),
        F.col("doc_id").asc(),
    ]
    out = _sidecar_dir(index_dir, field)
    write_table(
        dm.repartition(int(meta["n_shards"]), "shard")
        .sortWithinPartitions(*order),
        out,
        partition_by=["shard"],
    )
    with open(os.path.join(out, SORT_META), "w") as f:
        json.dump({"field": field, "ascending": bool(ascending)}, f)
    return out


def sorted_topk(
    spark: SparkSession,
    index_dir: str,
    field: str,
    k: int,
    ascending: bool = False,
    filter_expr: str | None = None,
    _consumed_acc=None,
) -> DataFrame:
    """Top-``k`` live docs by the sidecar-sorted field ->
    ``(rank, doc_id, sort_value)``. Early-terminates each split after
    ``k`` surviving rows (see module docstring).

    ``_consumed_acc``: optional Spark accumulator; when given, the
    kernel adds each CONSUMED batch's row count — the test hook that
    proves unread row groups stay unread."""
    if k < 1:
        raise ValueError("k must be >= 1")
    side = _sidecar_dir(index_dir, field)
    mpath = os.path.join(side, SORT_META)
    if not os.path.isfile(mpath):
        raise ValueError(
            f"no sort sidecar for {field!r}; run write_sorted_docvalues"
        )
    with open(mpath) as f:
        smeta = json.load(f)
    if bool(ascending) != bool(smeta["ascending"]):
        raise ValueError(
            f"sidecar for {field!r} is sorted "
            f"{'asc' if smeta['ascending'] else 'desc'}; "
            "rebuild it for the requested order"
        )
    from sparkfts.deletes import load_tombstones

    tomb = load_tombstones(spark, index_dir)
    df = spark.read.parquet(side)
    if filter_expr:
        df = df.where(filter_expr)  # pushed into the scan by Catalyst
    df = df.select("doc_id", F.col(field).alias("v"))

    kk = int(k)

    def head_k(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        taken = 0
        for pdf in batches:
            if _consumed_acc is not None:
                _consumed_acc.add(len(pdf))
            if tomb is not None and len(pdf):
                keep = ~np.isin(
                    pdf["doc_id"].to_numpy(np.int64), tomb,
                    assume_unique=False,
                )
                pdf = pdf[keep]
            if not len(pdf):
                continue
            take = min(kk - taken, len(pdf))
            taken += take
            yield pdf.iloc[:take]
            if taken >= kk:
                return  # stop consuming -> Spark stops reading the split

    cand = df.mapInPandas(head_k, df.schema)
    order = [
        F.col("v").asc() if ascending else F.col("v").desc(),
        F.col("doc_id").asc(),
    ]
    top = cand.orderBy(*order).limit(kk)
    from pyspark.sql import Window

    w = Window.orderBy(*order)  # bounded: <= k rows reach this window
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", F.col("v").alias("sort_value")
    )
