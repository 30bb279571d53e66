"""Storage layer: Iceberg table when available, parquet directory fallback.

The north rule targets Iceberg tables (snapshot-isolated commits make
segment swaps and checkpoint writes single atomic operations). This
sandbox has no Iceberg runtime jar, so every artifact (postings, docmap,
terms, checkpoints) lives in an equivalent partitioned-parquet layout;
this module is the seam between the two:

- ``location`` strings containing a dot and no path separator (e.g.
  ``local.fts.postings``) are treated as catalog table identifiers and
  routed through the Iceberg ``writeTo``/``table`` API;
- anything else is a filesystem path and uses partitioned parquet.

Semantics preserved across both branches: full-overwrite writes,
partition column layout, and read-back as a plain DataFrame. What parquet
mode CANNOT give is multi-directory atomicity — callers order their
operations so a crash leaves either the old layout readable or the new
one complete (sparkfts.merge), and single-file ``os.replace`` commits
cover the checkpoint/meta writes (sparkfts.checkpoint).

To deploy on Iceberg: submit with
``--packages org.apache.iceberg:iceberg-spark-runtime-<ver>`` and
``--conf spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog``
(+ warehouse), then pass table identifiers instead of paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def is_table_identifier(location: str) -> bool:
    """``catalog.db.table`` vs filesystem path."""
    return "." in location and os.sep not in location and "/" not in location


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg SparkCatalog class is loadable in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    location: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Overwrite ``location`` with ``df`` (Iceberg table or parquet dir)."""
    if is_table_identifier(location):
        writer = df.writeTo(location)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()
        return
    w = df.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(location)


def read_table(spark: SparkSession, location: str) -> DataFrame:
    if is_table_identifier(location):
        return spark.read.table(location)
    return spark.read.parquet(location)


def location_exists(spark: SparkSession, location: str) -> bool:
    if is_table_identifier(location):
        return spark.catalog.tableExists(location)
    return os.path.isdir(location)
