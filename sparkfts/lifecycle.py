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


def mget(
    spark: SparkSession,
    index_dir: str,
    doc_ids: list[int],
    with_source: bool = False,
) -> DataFrame:
    """ES ``_mget`` -> one row per requested id, REQUEST order
    preserved: (doc_id, found, url, doclen[, text]). Applies the
    query-path visibility rule: newest segment wins per doc,
    tombstoned docs report ``found = false``.

    Plan: the id list broadcast-joins the docmap scan (the IN
    predicate pushes into the parquet read, and the docmap is
    shard-partitioned, so only the owning row groups are touched);
    ``with_source=True`` additionally joins the stored ``_source``
    table (requires ``store_source=True`` at build time)."""
    from sparkfts.deletes import load_tombstones
    from sparkfts.index import in_list, load_docmap, load_source

    ids = [int(d) for d in doc_ids]
    if not ids:
        schema = "doc_id long, found boolean, url string, doclen int"
        return spark.createDataFrame(
            [], schema + (", text string" if with_source else "")
        )
    req = spark.createDataFrame(
        [(d, i) for i, d in enumerate(ids)], "doc_id long, _ord int"
    )

    def newest(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("doc_id").orderBy(F.desc("segment_id"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "segment_id")
        )

    dm = newest(
        load_docmap(spark, index_dir).where(in_list("doc_id", sorted(set(ids))))
    ).select("doc_id", "url", "doclen")
    tombstones = load_tombstones(spark, index_dir)
    if tombstones is not None:
        tomb = spark.createDataFrame(
            [(int(d),) for d in tombstones], "doc_id long"
        )
        dm = dm.join(F.broadcast(tomb), "doc_id", "left_anti")
    out = req.join(dm, "doc_id", "left").withColumn(
        "found", F.col("url").isNotNull()
    )
    cols = ["doc_id", "found", "url", "doclen"]
    if with_source:
        src = newest(
            load_source(spark, index_dir).where(
                in_list("doc_id", sorted(set(ids)))
            )
        ).select("doc_id", "text")
        out = out.join(src, "doc_id", "left").withColumn(
            # a tombstoned doc still has segment _source bytes; found
            # governs visibility for every field
            "text", F.when(F.col("found"), F.col("text"))
        )
        cols.append("text")
    return out.orderBy("_ord").select(*cols)


def terms_lookup_values(
    spark: SparkSession,
    index_dir: str,
    lookup_doc_id: int,
    path: str,
    max_terms: int = 65536,
) -> list:
    """ES terms-lookup fetch (the ``terms`` query's index/id/path
    form): the value(s) of ``path`` on the lookup document, ready for
    :func:`terms_lookup_expr`.

    - ``path='text'``: the list-valued case — the analyzed DISTINCT
      token list of the stored ``_source`` (requires
      ``store_source=True``), under the index's own pinned chain.
    - otherwise ``path`` must be ``url`` or a docvalue column ->
      ``[value]`` (newest segment wins; tombstoned lookup doc = not
      found, fail loud — ES returns no terms and matches nothing, but
      silence here would hide a caller bug).

    Driver-side literal list BY DESIGN: ES caps terms lookup at 65536
    terms (same bound here, fail loud), so the fetched list is always
    coordinator-sized, and the resulting IN predicate pushes into the
    docmap parquet scan like any bool.filter."""
    from sparkfts.analysis import analysis_opts, tokenize
    from sparkfts.index import read_meta

    meta = read_meta(index_dir)
    if path == "text":
        row = mget(
            spark, index_dir, [int(lookup_doc_id)], with_source=True
        ).collect()[0]
        if not row["found"]:
            raise ValueError(f"lookup doc {lookup_doc_id} not found")
        sw, stem = analysis_opts(meta)
        vals = sorted(set(tokenize(row["text"], sw, stem)))
    else:
        avail = ["url"] + [
            c for c in meta.get("docvalue_cols", []) if c != "doc_id"
        ]
        if path not in avail:
            raise ValueError(
                f"terms-lookup path {path!r} not on the docmap "
                f"(have {avail} + 'text' with store_source)"
            )
        from sparkfts.deletes import load_tombstones
        from sparkfts.index import load_docmap

        tombstones = load_tombstones(spark, index_dir) or set()
        if int(lookup_doc_id) in tombstones:
            raise ValueError(f"lookup doc {lookup_doc_id} is deleted")
        rows = (
            load_docmap(spark, index_dir)
            .where(F.col("doc_id") == int(lookup_doc_id))
            .select(path, "segment_id")
            .orderBy(F.desc("segment_id"))
            .limit(1)
            .collect()
        )
        if not rows:
            raise ValueError(f"lookup doc {lookup_doc_id} not found")
        vals = [rows[0][path]]
    if len(vals) > int(max_terms):
        raise ValueError(
            f"terms lookup fetched {len(vals)} terms > max_terms "
            f"{max_terms} (the ES 65536 cap)"
        )
    return vals


def terms_lookup_expr(field: str, values: list) -> str:
    """Values from :func:`terms_lookup_values` -> a ``bool.filter``
    predicate string for ``bm25_index_batch(filter_expr=...)`` /
    ``SearchRequest``. Strings are quoted + escaped; ints pass raw."""
    if not values:
        # ES: an empty lookup matches nothing
        return "1 = 0"
    parts = []
    for v in values:
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            s = str(v).replace("\\", "\\\\").replace("'", "\\'")
            parts.append(f"'{s}'")
        else:
            parts.append(str(v))
    return f"{field} IN ({', '.join(parts)})"


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


# ---------------------------------------------------------------------------
# Snapshot / restore (ES _snapshot repository surface)
# ---------------------------------------------------------------------------

SNAPSHOT_MANIFEST = "snapshot.json"


def _file_md5(path: str) -> str:
    import hashlib

    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _walk_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            out.append(
                os.path.relpath(os.path.join(dirpath, fn), root)
            )
    return sorted(out)


def snapshot(
    index_dir: str,
    repo_dir: str,
    name: str,
) -> dict:
    """Point-in-time snapshot of ``index_dir`` into ``repo_dir/name``.

    ES semantics pinned: snapshots are immutable, named, and
    INCREMENTAL — a file whose (relative path, size, md5) matches the
    newest prior snapshot in the repo is HARD-LINKED instead of
    copied (segments are immutable once written, so unchanged segment
    files dedupe exactly like ES's segment-level sharing; works on any
    POSIX filesystem, falls back to a copy when linking fails).
    Written atomically: staged under ``<name>.tmp`` then renamed — a
    crashed snapshot never appears in :func:`list_snapshots`.
    """
    import json as _json
    import shutil

    if not name or "/" in name:
        raise ValueError("snapshot name must be a plain directory name")
    dst = os.path.join(repo_dir, name)
    if os.path.exists(dst):
        raise FileExistsError(f"snapshot {name!r} already exists")
    prior = None
    priors = list_snapshots(repo_dir)
    if priors:
        prior = os.path.join(repo_dir, priors[-1]["name"])
    prior_manifest = {}
    if prior is not None:
        with open(os.path.join(prior, SNAPSHOT_MANIFEST)) as f:
            prior_manifest = {
                e["path"]: e for e in _json.load(f)["files"]
            }

    tmp = dst + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    files, linked = [], 0
    for rel in _walk_files(index_dir):
        src = os.path.join(index_dir, rel)
        out = os.path.join(tmp, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        size = os.path.getsize(src)
        digest = _file_md5(src)
        pe = prior_manifest.get(rel)
        if pe and pe["size"] == size and pe["md5"] == digest:
            try:
                os.link(os.path.join(prior, rel), out)
                linked += 1
            except OSError:
                shutil.copy2(src, out)
        else:
            shutil.copy2(src, out)
        files.append({"path": rel, "size": size, "md5": digest})
    manifest = {
        "name": name,
        "source": os.path.abspath(index_dir),
        "n_files": len(files),
        "total_bytes": sum(e["size"] for e in files),
        "files": files,
    }
    with open(os.path.join(tmp, SNAPSHOT_MANIFEST), "w") as f:
        _json.dump(manifest, f, indent=2)
    os.rename(tmp, dst)  # atomic commit: dst checked absent above
    return {
        "name": name,
        "n_files": len(files),
        "linked": linked,
        "total_bytes": manifest["total_bytes"],
    }


def list_snapshots(repo_dir: str) -> list[dict]:
    """Committed snapshots in the repo, name-sorted (ES `_cat/snapshots`
    analogue); staging dirs (`*.tmp`) are invisible."""
    import json as _json

    if not os.path.isdir(repo_dir):
        return []
    out = []
    for name in sorted(os.listdir(repo_dir)):
        mpath = os.path.join(repo_dir, name, SNAPSHOT_MANIFEST)
        if name.endswith(".tmp") or not os.path.isfile(mpath):
            continue
        with open(mpath) as f:
            m = _json.load(f)
        out.append({
            "name": name,
            "n_files": m["n_files"],
            "total_bytes": m["total_bytes"],
        })
    return out


def restore_snapshot(
    repo_dir: str,
    name: str,
    target_dir: str,
    verify: bool = True,
) -> dict:
    """Restore snapshot ``name`` into a NEW index dir (ES restores
    into a new/closed index; an existing live target fails loud).
    ``verify=True`` re-hashes every file against the manifest and
    refuses a corrupted repository instead of restoring garbage."""
    import json as _json
    import shutil

    src = os.path.join(repo_dir, name)
    mpath = os.path.join(src, SNAPSHOT_MANIFEST)
    if not os.path.isfile(mpath):
        raise FileNotFoundError(f"no snapshot {name!r} in {repo_dir}")
    if os.path.exists(target_dir):
        raise FileExistsError(
            f"restore target {target_dir} exists; restore into a new dir"
        )
    with open(mpath) as f:
        manifest = _json.load(f)
    if verify:
        for e in manifest["files"]:
            p = os.path.join(src, e["path"])
            if (
                not os.path.isfile(p)
                or os.path.getsize(p) != e["size"]
                or _file_md5(p) != e["md5"]
            ):
                raise ValueError(
                    f"snapshot {name!r} is corrupt at {e['path']}"
                )
    tmp = target_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    for e in manifest["files"]:
        out = os.path.join(tmp, e["path"])
        os.makedirs(os.path.dirname(out), exist_ok=True)
        shutil.copy2(os.path.join(src, e["path"]), out)
    os.rename(tmp, target_dir)
    return {
        "name": name,
        "target": target_dir,
        "n_files": manifest["n_files"],
    }


def field_caps(spark, index_dirs: list[str] | str) -> dict:
    """ES ``_field_caps``: per-field capabilities across one or more
    indexes — Spark type, searchable (the indexed text field),
    aggregatable (doc-value columns + doc_id), and which indexes carry
    the field. Metadata-only: reads each index's meta.json and the
    docmap SCHEMA (no data scan — parquet footers only).

    Shape: ``{field: {"type": ..., "searchable": bool,
    "aggregatable": bool, "indices": [...]}}``. Cross-index type
    conflicts are reported ES-style: ``type`` becomes ``"conflict"``
    and ``types`` maps each index to its type.
    """
    from sparkfts.index import load_docmap, read_meta

    if isinstance(index_dirs, str):
        index_dirs = [index_dirs]
    if not index_dirs:
        raise ValueError("need at least one index")
    out: dict = {}
    for idx in index_dirs:
        meta = read_meta(idx)
        dv = set(meta.get("docvalue_cols") or [])
        schema = load_docmap(spark, idx).schema
        for f in schema.fields:
            name, typ = f.name, f.dataType.simpleString()
            if name == "shard":
                continue
            rec = out.setdefault(
                name,
                {
                    "type": typ,
                    "searchable": False,
                    "aggregatable": name == "doc_id" or name in dv,
                    "indices": [],
                    "types": {},
                },
            )
            rec["indices"].append(idx)
            rec["types"][idx] = typ
            if typ != rec["type"]:
                rec["type"] = "conflict"
            rec["aggregatable"] = rec["aggregatable"] or name in dv
        # the analyzed full-text field itself (not a docmap column)
        rec = out.setdefault(
            "text",
            {
                "type": "text",
                "searchable": True,
                "aggregatable": False,
                "indices": [],
                "types": {},
            },
        )
        rec["indices"].append(idx)
        rec["types"][idx] = "text"
    for rec in out.values():
        if len(set(rec["types"].values())) == 1:
            rec.pop("types")
    return out


def shrink(
    spark,
    src_index: str,
    dst_index: str,
    n_shards: int,
) -> dict:
    """ES ``_shrink`` / ``_split``: change an index's shard count.

    ES shrinks by hard-linking segment files into fewer shards
    (possible because Lucene shards are independent files); the Spark
    engine's shard is a doc-space hash partition, so resharding is a
    :func:`reindex` from stored ``_source`` into the new layout —
    one distributed rebuild, doc ids preserved, analyzer options
    inherited from the source meta (a reshard must NOT silently change
    analysis). ES's divisibility rule is enforced for parity: the new
    count must divide (shrink) or be a multiple of (split) the old.
    """
    from sparkfts.index import read_meta

    src_meta = read_meta(src_index)
    old = int(src_meta["n_shards"])
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if n_shards == old:
        raise ValueError(f"index already has {old} shards")
    if n_shards < old and old % n_shards != 0:
        raise ValueError(
            f"shrink target must divide the source count ({old})"
        )
    if n_shards > old and n_shards % old != 0:
        raise ValueError(
            f"split target must be a multiple of the source count ({old})"
        )
    return reindex(
        spark, src_index, dst_index,
        n_shards=n_shards,
        stopwords=(src_meta.get("stopwords") or None),
        stemmer=src_meta.get("stemmer"),
    )


def update_by_query(
    spark,
    index_dir: str,
    query: str,
    processors: list[dict],
    mode: str = "and",
) -> dict:
    """ES ``_update_by_query`` (+ pipeline): apply an ingest pipeline
    to every doc matching ``query`` and reindex the results as a new
    superseding segment — the existing re-crawl machinery does the
    rest (newest segment wins at query time; the old copies reclaim
    physically at merge).

    Composition of owned pieces, no new kernels: score-free match
    kernel -> stored ``_source`` reconstruction (newest-wins,
    tombstone-aware) -> :func:`sparkfts.ingest.apply_pipeline` (ONE
    Catalyst projection) -> :func:`sparkfts.streaming.ingest_batch`
    with the root index's layout/analyzer (inherited there by
    contract). Requires ``store_source=True`` and the default sha1
    url->id mapping (the updated rows re-derive the SAME doc ids from
    their urls — that identity is what makes the new segment
    supersede; a pipeline must therefore not rewrite ``url``).
    Returns ``{"matched": m, "updated": u, "segment": name}``.

    Identity ENFORCED, not assumed (round-4 ADVICE): before committing
    the segment, every matched doc's stored doc_id is checked against
    sha1(url) — the id the re-ingest will derive.  On an index built
    with ``id_source='column'`` and non-sha1 ids the re-ingest would
    produce DIFFERENT ids, silently duplicating matched docs (old +
    rewritten both visible); this now fails loud instead.  The check is
    exact (full matched set, one conditional count on a frame already
    materialized for ``matched``) and catches stale/absent meta too —
    ``meta['id_source']`` is persisted since round 5 but a reindexed
    index legitimately carries ``'column'`` ids that ARE sha1(url), so
    the id comparison, not the meta flag, is the gate.
    """
    from sparkfts.aggs import match_docs_batch
    from sparkfts.index import read_meta
    from sparkfts.ingest import apply_pipeline
    from sparkfts.streaming import _read_running, ingest_batch
    from sparkfts.tokens import doc_id_udf

    meta = read_meta(index_dir)
    if not meta.get("store_source"):
        raise ValueError(
            "update_by_query needs store_source=True (no _source, "
            "nothing to rewrite)"
        )
    matched = match_docs_batch(
        spark, index_dir, [(0, query)], mode
    ).select("doc_id").distinct()
    with_ids = source_pages(spark, index_dir).join(matched, "doc_id")
    counts = with_ids.agg(
        F.count("*").alias("n"),
        F.sum(
            (doc_id_udf(F.col("url")) != F.col("doc_id")).cast("long")
        ).alias("n_bad"),
    ).collect()[0]
    n_matched = int(counts["n"])
    if n_matched == 0:
        return {"matched": 0, "updated": 0, "segment": None}
    if int(counts["n_bad"] or 0) > 0:
        raise ValueError(
            f"update_by_query requires sha1(url) doc ids: "
            f"{int(counts['n_bad'])} of {n_matched} matched docs have ids "
            "that do not re-derive from their url (index built with "
            f"id_source={meta.get('id_source', 'unknown')!r}) — the "
            "rewritten segment would DUPLICATE them instead of "
            "superseding"
        )
    pages = with_ids.drop("doc_id")
    updated = apply_pipeline(pages, processors)
    for col in ("url", "text"):
        if col not in updated.columns:
            raise ValueError(
                f"pipeline must preserve the {col!r} column (doc "
                "identity / reindex input)"
            )
    used = {
        int(b.split("_")[1])
        for b in _read_running(index_dir)["batches"]
        if b.startswith("stream_")
    }
    batch_id = (max(used) + 1) if used else 0
    ingest_batch(
        updated, batch_id, index_dir,
        n_shards=int(meta["n_shards"]),
        n_tbuckets=int(meta["n_tbuckets"]),
        positions=os.path.isdir(os.path.join(index_dir, "positions")),
    )
    return {
        "matched": int(n_matched),
        "updated": int(n_matched),
        "segment": f"stream_{batch_id:08d}",
    }


def clone_index(src_index: str, dst_index: str) -> dict:
    """ES ``_clone``: an exact copy of an index under a new name, same
    shard count — ES hard-links segment files; so do we (falling back
    to copy across filesystems), so a 100-TB clone is metadata-speed.

    The destination must not exist (ES's rule). Commit is atomic via
    the temp+rename idiom every writer here uses.
    """
    import shutil

    if not os.path.isdir(src_index):
        raise ValueError(f"source index {src_index!r} does not exist")
    if os.path.exists(dst_index):
        raise ValueError(f"target {dst_index!r} already exists")
    tmp = dst_index + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    n = 0
    for rel in _walk_files(src_index):
        s = os.path.join(src_index, rel)
        d = os.path.join(tmp, rel)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        try:
            os.link(s, d)
        except OSError:
            shutil.copy2(s, d)
        n += 1
    os.rename(tmp, dst_index)
    return {"source": src_index, "target": dst_index, "n_files": n}


def forcemerge(spark, index_dir: str) -> dict:
    """ES ``_forcemerge`` (max_num_segments=1): compact all segments —
    and reclaim tombstoned/superseded docs — into the root layout.
    Thin alias over :func:`sparkfts.merge.merge_segments` (the ES name
    a user of the rebuilt surface reaches for)."""
    from sparkfts.merge import merge_segments

    return merge_segments(spark, index_dir)
