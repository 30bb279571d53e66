"""Index sorting + early termination (ES index.sort)."""

from __future__ import annotations

import os

import pytest

from sparkfts.index import build_index
from sparkfts.sortedindex import sorted_topk, write_sorted_docvalues


@pytest.fixture(scope="module")
def sorted_idx(spark, pages_df, tmp_path_factory):
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("sorted_idx"))
    pages = pages_df.withColumn("n_chars", F.length("text"))
    build_index(
        pages, d, n_shards=2, n_tbuckets=4,
        docvalue_cols=["n_chars", "lang"],
    )
    write_sorted_docvalues(spark, d, "n_chars", ascending=False)
    return d


def _brute(spark, idx, filt=None):
    from sparkfts.index import load_docmap

    rows = load_docmap(spark, idx).select(
        "doc_id", "n_chars", "lang"
    ).collect()
    if filt:
        rows = [r for r in rows if filt(r)]
    return sorted(rows, key=lambda r: (-r["n_chars"], r["doc_id"]))


def test_sorted_topk_matches_brute(spark, sorted_idx):
    got = sorted_topk(spark, sorted_idx, "n_chars", k=15).collect()
    exp = _brute(spark, sorted_idx)[:15]
    assert [(r["rank"], r["doc_id"], r["sort_value"]) for r in got] == [
        (i + 1, r["doc_id"], r["n_chars"]) for i, r in enumerate(exp)
    ]


def test_sorted_topk_with_filter(spark, sorted_idx):
    got = sorted_topk(
        spark, sorted_idx, "n_chars", k=8, filter_expr="lang = 'en'"
    ).collect()
    exp = _brute(spark, sorted_idx, lambda r: r["lang"] == "en")[:8]
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in exp]


def test_sorted_topk_excludes_tombstones(spark, sorted_idx):
    from sparkfts.deletes import delete_docs

    top1 = sorted_topk(spark, sorted_idx, "n_chars", k=1).collect()[0]
    delete_docs(spark, sorted_idx, [int(top1["doc_id"])])
    try:
        got = sorted_topk(spark, sorted_idx, "n_chars", k=5).collect()
        assert top1["doc_id"] not in {r["doc_id"] for r in got}
        exp = [
            r for r in _brute(spark, sorted_idx)
            if r["doc_id"] != top1["doc_id"]
        ][:5]
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in exp]
    finally:
        import shutil

        shutil.rmtree(os.path.join(sorted_idx, "tombstones"),
                      ignore_errors=True)


def test_early_termination_reads_bounded_rows(spark, sorted_idx):
    """The kernel must stop consuming Arrow batches after k rows —
    consumed rows stay far below the table size."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
    try:
        acc = spark.sparkContext.accumulator(0)
        got = sorted_topk(
            spark, sorted_idx, "n_chars", k=5, _consumed_acc=acc
        ).collect()
        assert len(got) == 5
        from sparkfts.index import load_docmap

        total = load_docmap(spark, sorted_idx).count()
        # per split: at most ceil(5/32)*32 = 32 consumed rows; far
        # under the full table whatever the split count
        assert 0 < acc.value < total / 2, (acc.value, total)
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )


def test_sorted_sidecar_validation(spark, sorted_idx, pages_df,
                                   tmp_path_factory):
    with pytest.raises(ValueError, match="sorted"):
        sorted_topk(spark, sorted_idx, "n_chars", k=3, ascending=True)
    with pytest.raises(ValueError, match="sidecar"):
        sorted_topk(spark, sorted_idx, "lang", k=3)
    with pytest.raises(ValueError, match="docvalue"):
        write_sorted_docvalues(spark, sorted_idx, "nope")
    with pytest.raises(ValueError):
        sorted_topk(spark, sorted_idx, "n_chars", k=0)
    # index without docvalues rejects sidecar builds
    d = str(tmp_path_factory.mktemp("nodv_idx"))
    build_index(pages_df, d, n_shards=2, n_tbuckets=4)
    with pytest.raises(ValueError):
        write_sorted_docvalues(spark, d, "n_chars")
