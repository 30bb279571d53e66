"""Index lifecycle: reindex (ES ``_reindex``) and rollover (ES ILM).

The reference treats its index as a fixed name it syncs into (reference
ElasticsearchToNeo4jSync.py:92 ``index=...``); the operational surface a
real deployment needs next is re-analyzing an existing index (analyzer
change without the original corpus — ES ``_reindex`` reading
``_source``) and rolling a write alias to a fresh index when the
current one is full (ES rollover). Both compose existing machinery:

- ``reindex`` reads the stored ``_source`` table
  (``build_index(store_source=True)``), reconstructs the page table
  (newest segment wins per doc, tombstones excluded — the same
  visibility rule every query path applies) and runs a normal
  distributed build with the NEW analysis options. No driver-side
  corpus pass; the source scan is a shard-partitioned parquet read.
- ``rollover`` is a registry + condition check on the alias's WRITE
  index (last entry, ES convention): when ``max_docs`` / ``max_bytes``
  is exceeded the alias atomically gains the next index dir. The new
  dir need not exist yet — the first ``ingest_batch`` into it creates
  it (the streaming plane's fresh-dir path), mirroring ES creating the
  rollover index empty.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def source_pages(spark: SparkSession, index_dir: str) -> DataFrame:
    """Reconstruct the page table (doc_id, url, text[, docvalues...])
    from the stored ``_source`` + docmap: newest segment wins per doc,
    tombstoned docs excluded."""
    from sparkfts.deletes import load_tombstones
    from sparkfts.index import load_docmap, load_source, read_meta

    meta = read_meta(index_dir)
    dv = [c for c in meta.get("docvalue_cols", [])]

    def newest(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("doc_id").orderBy(F.desc("segment_id"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "segment_id")
        )

    src = newest(load_source(spark, index_dir)).select("doc_id", "text")
    dm = newest(load_docmap(spark, index_dir)).select("doc_id", "url", *dv)
    pages = src.join(dm, "doc_id")
    tombstones = load_tombstones(spark, index_dir)
    if tombstones is not None:
        tomb = spark.createDataFrame(
            [(int(d),) for d in tombstones], "doc_id long"
        )
        pages = pages.join(F.broadcast(tomb), "doc_id", "left_anti")
    return pages


def reindex(
    spark: SparkSession,
    src_index: str,
    dst_index: str,
    n_shards: int | None = None,
    n_tbuckets: int | None = None,
    stopwords: list[str] | None = None,
    stemmer: str | None = None,
    store_source: bool = True,
    positions: bool = False,
) -> dict:
    """ES ``_reindex``: rebuild ``src_index``'s documents into
    ``dst_index`` with NEW analysis/layout options, reading the stored
    ``_source`` (no original corpus needed). Doc ids are preserved
    (``id_source="column"``), so downstream joins/aliases keep working.
    Defaults inherit the source index's shard/bucket layout; analyzer
    options default to NONE (a reindex exists to change them — pass the
    old ones explicitly to keep them). Returns the new index's meta."""
    from sparkfts.index import build_index, read_meta

    if os.path.abspath(src_index) == os.path.abspath(dst_index):
        raise ValueError("reindex in place is not supported (ES parity: "
                         "_reindex requires a different destination)")
    src_meta = read_meta(src_index)
    pages = source_pages(spark, src_index)
    meta = build_index(
        pages,
        dst_index,
        n_shards=int(n_shards or src_meta["n_shards"]),
        n_tbuckets=int(n_tbuckets or src_meta["n_tbuckets"]),
        id_source="column",
        docvalue_cols=src_meta.get("docvalue_cols") or None,
        stopwords=stopwords,
        stemmer=stemmer,
        store_source=store_source,
    )
    if positions:
        # analysis options come from the just-written dst meta
        from sparkfts.phrase import build_positions

        build_positions(pages, dst_index, id_source="column")
    return meta


def _dir_bytes(index_dir: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(index_dir):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(root, fn))
            except OSError:
                pass
    return total


def rollover(
    spark: SparkSession,
    registry_dir: str,
    alias: str,
    next_index_dir: str,
    max_docs: int | None = None,
    max_bytes: int | None = None,
) -> dict:
    """ES rollover: if the alias's WRITE index (last target) exceeds any
    given condition, atomically append ``next_index_dir`` to the alias
    (it becomes the new write index; reads keep spanning all targets via
    :func:`sparkfts.multiindex.search_alias`). Returns
    ``{"rolled": bool, "write_index": str, "conditions": {...}}``."""
    from sparkfts.index import read_meta
    from sparkfts.multiindex import _load, put_alias

    if max_docs is None and max_bytes is None:
        raise ValueError("rollover needs at least one condition "
                         "(max_docs / max_bytes)")
    aliases = _load(registry_dir)
    if alias not in aliases:
        raise KeyError(f"no such alias: {alias}")
    targets = aliases[alias]
    write_idx = targets[-1]
    if os.path.abspath(next_index_dir) in {
        os.path.abspath(t) for t in targets
    }:
        raise ValueError(f"{next_index_dir} is already an alias target")

    conditions: dict = {}
    met = False
    n_docs = int(read_meta(write_idx)["n_docs"])
    if max_docs is not None:
        conditions["max_docs"] = {"current": n_docs, "limit": int(max_docs)}
        met = met or n_docs >= int(max_docs)
    if max_bytes is not None:
        size = _dir_bytes(write_idx)
        conditions["max_bytes"] = {"current": size, "limit": int(max_bytes)}
        met = met or size >= int(max_bytes)

    if met:
        put_alias(registry_dir, alias, list(targets) + [next_index_dir])
        write_idx = next_index_dir
    return {"rolled": met, "write_index": write_idx,
            "conditions": conditions}
