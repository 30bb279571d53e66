"""Training-shard export: size-targeted files, no tiny-file explosion."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest

from sparkfts.ops.export import export_training_shards


@pytest.fixture()
def docs(spark):
    rows = []
    big = "x" * 65536
    for i in range(40):  # 'en': ~2.5 MB -> 3 files at 1 MB target
        rows.append((i, "en", big))
    for i in range(5):  # 'de': tiny -> 1 file
        rows.append((100 + i, "de", "small text"))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    )


def test_export_layout_and_manifest(spark, docs, tmp_path):
    out = os.path.join(str(tmp_path), "shards")
    manifest = export_training_shards(
        docs, out, ["lang"], target_file_mb=1
    ).collect()
    by = {r["lang"]: r for r in manifest}
    assert by["en"]["n_docs"] == 40 and by["en"]["n_files"] == 3
    assert by["de"]["n_docs"] == 5 and by["de"]["n_files"] == 1
    for lang in ("en", "de"):
        shards = glob.glob(os.path.join(out, f"lang={lang}", "shard=*"))
        assert len(shards) == by[lang]["n_files"], lang
        for sd in shards:  # exactly ONE file per shard dir
            assert len(glob.glob(os.path.join(sd, "*.parquet"))) == 1
    back = spark.read.parquet(out)
    assert back.count() == 45
    assert {r["doc_id"] for r in back.collect()} == {
        r["doc_id"] for r in docs.collect()
    }


def test_export_deterministic(spark, docs, tmp_path):
    a = os.path.join(str(tmp_path), "a")
    b = os.path.join(str(tmp_path), "b")
    m1 = export_training_shards(docs, a, ["lang"],
                                target_file_mb=1).collect()
    m2 = export_training_shards(docs, b, ["lang"],
                                target_file_mb=1).collect()
    assert sorted(map(tuple, m1)) == sorted(map(tuple, m2))
    # same row -> file assignment: per-file doc sets match across runs
    for lang in ("en",):
        fa = sorted(glob.glob(os.path.join(a, f"lang={lang}", "shard=*")))
        fb = sorted(glob.glob(os.path.join(b, f"lang={lang}", "shard=*")))
        sa = {
            frozenset(
                r["doc_id"]
                for r in spark.read.parquet(f).collect()
            )
            for f in fa
        }
        sb = {
            frozenset(
                r["doc_id"]
                for r in spark.read.parquet(f).collect()
            )
            for f in fb
        }
        assert sa == sb


def test_export_validation(spark, docs, tmp_path):
    out = os.path.join(str(tmp_path), "v")
    with pytest.raises(ValueError):
        export_training_shards(docs, out, [])
    with pytest.raises(ValueError):
        export_training_shards(docs, out, ["nope"])
    with pytest.raises(ValueError):
        export_training_shards(docs, out, ["lang"], target_file_mb=0)
