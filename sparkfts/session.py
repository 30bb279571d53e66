"""SparkSession factory tuned for the engine (local mode in the sandbox).

Parallelism is configuration, not code (the reference's
``generateDocuments`` vs ``generateDocumentsParallel`` duality,
reference ElasticsearchToNeo4jSync.py:273-303, dissolves into Spark's
executor model): the same plans run at ``local[8]`` and ``local[32]`` for
the N-vs-4N scaling evidence, and unchanged on a real multi-executor
cluster via ``spark-submit --py-files``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | str = "*",
    app_name: str = "sparkfts",
    shuffle_partitions: int | None = None,
    driver_mem: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``shuffle_partitions`` defaults to the core count (never the Spark
    default 200 — wrong at both ends for local mode). UTC session TZ is
    pinned so DuckDB-oracle comparisons are stable; Arrow transport is on
    because every custom kernel is an Arrow-batched pandas UDF.
    """
    if shuffle_partitions is None:
        shuffle_partitions = (
            os.cpu_count() or 8 if cores == "*" else max(int(cores), 2)
        )
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # local corpora are single small parquet files: without a low split
        # size the whole scan (extract+tokenize, the expensive stage) lands
        # in ONE task and added cores do nothing. 2 MB splits + cheap file
        # open cost keep the scan parallel; on a real cluster with many
        # input files these revert to larger values.
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "1m")
        # AQE's 64 MB advisory size would coalesce our small shuffles to 1-2
        # partitions and serialize the encode stage; 2 MB keeps local
        # parallelism while still merging truly tiny partitions.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.driver.memory",
            driver_mem or os.environ.get("SPARKFTS_DRIVER_MEM", "8g"),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def session_cores(spark) -> int:
    """Actual executor-core count of the session.

    ``sparkContext.defaultParallelism`` is overridden to the shuffle
    partition count here (see get_spark), so it is NOT the core count.
    Query paths use this to size tiny-scan coalesces and small-frame
    repartitions to the real parallelism.
    """
    master = spark.sparkContext.master
    if master.startswith("local["):
        v = master[len("local["):-1]
        return (os.cpu_count() or 8) if v == "*" else max(int(v), 1)
    return max(spark.sparkContext.defaultParallelism, 2)
