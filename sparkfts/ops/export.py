"""Training-shard export: write a curated corpus as a partitioned,
size-targeted parquet layout plus a manifest.

The last stage of a data pipeline is the one that most often falls
over at scale: a naive ``df.write.partitionBy(...)`` emits one file
per (task x partition-value) — the tiny-file explosion (10k tasks x
100 partitions = 1M files), while a blind ``coalesce(1)`` serializes
the job. This op computes the file layout FROM THE DATA:

1. one partially-aggregated count/bytes pass per partition tuple
   (rows = partition-value cardinality — tiny),
2. per-partition file counts = ``ceil(bytes / target_file_mb)``
   (driver arithmetic on the bounded frame),
3. a deterministic ``shard`` slot column (integer-LCG doc hash mod
   the partition's file count) becomes the LAST output partition
   level: ``partitionBy(*cols, "shard")`` writes exactly one
   ~target-size file per ``.../shard=N/`` dir (each (partition, shard)
   group lands wholly in one task; distinct dirs never merge, unlike
   plain repartition-by-salt where hash collisions fuse files). The
   numbered-shard-dir layout is the standard trainer input shape.

Returns a manifest DataFrame ``(partition values..., n_docs,
est_bytes, n_files)`` — the record a downstream trainer consumes to
plan its reads. Deterministic: the file salt is the integer-LCG doc
hash (sparkfts.ops.sampling family), so re-runs produce identical
row->file assignment.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from sparkfts.ops.sampling import HASH_A, HASH_B, HASH_P


def export_training_shards(
    docs: DataFrame,
    out_dir: str,
    partition_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    target_file_mb: int = 64,
) -> DataFrame:
    """Write ``docs`` under ``out_dir`` partitioned by
    ``partition_cols`` with ~``target_file_mb`` files; -> manifest."""
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    missing = [c for c in partition_cols if c not in docs.columns]
    if missing:
        raise ValueError(f"unknown partition cols {missing}")
    if target_file_mb < 1:
        raise ValueError("target_file_mb must be >= 1")

    sizes = docs.groupBy(*partition_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(text_col)).cast("long").alias("est_bytes"),
    )
    rows = sizes.collect()  # bounded: one row per partition tuple
    target = target_file_mb * (1 << 20)
    plan = {
        tuple(r[c] for c in partition_cols): max(
            1, math.ceil((r["est_bytes"] or 0) / target)
        )
        for r in rows
    }
    total_files = sum(plan.values())

    spark = docs.sparkSession
    pdf = spark.createDataFrame(
        [(*k, int(v)) for k, v in sorted(plan.items())],
        sizes.select(*partition_cols).schema.add("n_files", IntegerType()),
    )
    # deterministic per-doc file slot within its partition's n_files
    h = F.pmod(F.col(id_col).cast("long"), F.lit(HASH_P))
    slot = F.pmod(
        h * F.lit(HASH_A) + F.lit(HASH_B), F.lit(HASH_P)
    ) % F.col("n_files")
    shaped = (
        docs.join(F.broadcast(pdf), partition_cols)
        .withColumn("shard", slot.cast("int"))
        .drop("n_files")
    )
    (
        shaped.repartition(total_files, *partition_cols, F.col("shard"))
        .sortWithinPartitions(*partition_cols, "shard")
        .write.mode("overwrite")
        .partitionBy(*partition_cols, "shard")
        .parquet(out_dir)
    )
    manifest = spark.createDataFrame(
        [
            (*k, int(next(r["n_docs"] for r in rows
                          if tuple(r[c] for c in partition_cols) == k)),
             int(next(r["est_bytes"] or 0 for r in rows
                      if tuple(r[c] for c in partition_cols) == k)),
             int(v))
            for k, v in sorted(plan.items())
        ],
        sizes.schema.add("n_files", IntegerType()),
    )
    return manifest.select(
        *partition_cols,
        F.col("n_docs").cast("long"),
        F.col("est_bytes").cast("long"),
        F.col("n_files").cast("int"),
    )
