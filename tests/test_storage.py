"""Storage seam: location routing + parquet branch round-trip."""

from __future__ import annotations

import os

from sparkfts.storage import (
    iceberg_available,
    is_table_identifier,
    location_exists,
    read_table,
    write_table,
)


def test_location_classification():
    assert is_table_identifier("local.fts.postings")
    assert not is_table_identifier("/data/idx/postings")
    assert not is_table_identifier("rel/path.with.dots/postings")
    assert not is_table_identifier("postings")


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1), (3, "c", 0)], "id long, v string, p int"
    )
    loc = os.path.join(str(tmp_path), "tbl")
    assert not location_exists(spark, loc)
    write_table(df, loc, partition_by=["p"])
    assert location_exists(spark, loc)
    back = read_table(spark, loc)
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    assert sorted(os.listdir(loc))[0].startswith("p=") or any(
        d.startswith("p=") for d in os.listdir(loc)
    )
    # overwrite semantics
    write_table(df.limit(1), loc, partition_by=["p"])
    assert read_table(spark, loc).count() == 1


def test_iceberg_detection_is_honest(spark):
    # sandbox has no Iceberg runtime jar: detection must say so, not guess
    assert iceberg_available(spark) is False
