"""_source storage + reindex + rollover (sparkfts.lifecycle).

Pins: (a) store_source round-trips the exact text; (b) streamed
segments inherit the flag and merge consolidates newest-wins with
tombstone reclaim; (c) reindex from stored _source is rank-identical to
a fresh build from the original corpus with the same options, with doc
ids preserved; (d) rollover's condition check + atomic alias append.
"""

from __future__ import annotations

import os

import pytest

from sparkfts.index import build_index, load_source, read_meta
from sparkfts.lifecycle import reindex, rollover, source_pages
from sparkfts.synth import gen_corpus


@pytest.fixture(scope="module")
def src_corpus():
    return gen_corpus(150, seed=31)


@pytest.fixture(scope="module")
def src_index(spark, src_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lc") / "src")
    build_index(
        spark.createDataFrame(src_corpus.to_pandas()), d,
        n_shards=3, n_tbuckets=8, store_source=True,
        docvalue_cols=["lang"],
    )
    return d


def test_store_source_roundtrip(spark, src_corpus, src_index):
    assert read_meta(src_index)["store_source"] is True
    got = {
        r["doc_id"]: r["text"]
        for r in load_source(spark, src_index).collect()
    }
    pdf = src_corpus.to_pandas()
    from sparkfts.tokens import sha1_doc_id

    import pandas as pd

    ids = sha1_doc_id(pdf["url"])
    exp = dict(zip(ids, pdf["text"]))
    assert got == exp


def test_load_source_missing_raises(spark, src_corpus, tmp_path):
    d = os.path.join(str(tmp_path), "nosrc")
    build_index(
        spark.createDataFrame(src_corpus.to_pandas()), d,
        n_shards=2, n_tbuckets=4,
    )
    with pytest.raises(FileNotFoundError, match="store_source"):
        load_source(spark, d)


def test_reindex_matches_fresh_build(spark, src_corpus, src_index, tmp_path):
    """Reindex with NEW analyzer options == fresh build from the
    original corpus with those options: same meta stats, same ranking,
    same doc ids."""
    from sparkfts.query import bm25_index_batch

    stop = ["the", "a", "of", "and", "to"]
    dst = os.path.join(str(tmp_path), "dst")
    ref = os.path.join(str(tmp_path), "ref")
    m_dst = reindex(spark, src_index, dst, stopwords=stop)
    build_index(
        spark.createDataFrame(src_corpus.to_pandas()), ref,
        n_shards=3, n_tbuckets=8, stopwords=stop, docvalue_cols=["lang"],
    )
    m_ref = read_meta(ref)
    assert m_dst["n_docs"] == m_ref["n_docs"]
    assert m_dst["avgdl"] == pytest.approx(m_ref["avgdl"], rel=1e-12)
    assert m_dst["stopwords"] == m_ref["stopwords"]

    from collections import Counter

    from sparkfts.analysis import tokenize

    c: Counter = Counter()
    for t in src_corpus.column("text").to_pylist():
        c.update(set(tok for tok in tokenize(t) if tok not in stop))
    q = " ".join(t for t, _ in c.most_common(2))
    for mode in ("and", "or"):
        got = bm25_index_batch(spark, dst, [(0, q, 10)], mode=mode).collect()
        exp = bm25_index_batch(spark, ref, [(0, q, 10)], mode=mode).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in exp
        ], mode
        assert got, "test premise: query matches"
    # reindex keeps _source by default -> chain reindexes work
    assert read_meta(dst)["store_source"] is True
    load_source(spark, dst)


def test_reindex_requires_source_and_distinct_dst(spark, src_corpus,
                                                  src_index, tmp_path):
    nosrc = os.path.join(str(tmp_path), "nosrc2")
    build_index(
        spark.createDataFrame(src_corpus.to_pandas()), nosrc,
        n_shards=2, n_tbuckets=4,
    )
    with pytest.raises(FileNotFoundError, match="store_source"):
        reindex(spark, nosrc, os.path.join(str(tmp_path), "x"))
    with pytest.raises(ValueError, match="in place"):
        reindex(spark, src_index, src_index)


def test_streamed_segments_inherit_and_merge_consolidates(spark, tmp_path):
    """Appends inherit store_source; a re-crawled doc's NEWEST text wins
    at merge; a deleted doc's source is reclaimed."""
    from sparkfts.deletes import delete_docs
    from sparkfts.merge import merge_segments
    from sparkfts.streaming import ingest_batch
    from sparkfts.tokens import sha1_doc_id

    corp = gen_corpus(60, seed=8).to_pandas()
    idx = os.path.join(str(tmp_path), "sidx")
    build_index(
        spark.createDataFrame(corp.iloc[:40]), idx,
        n_shards=2, n_tbuckets=4, store_source=True,
    )
    # wave: 15 new docs + 1 re-crawl of an existing url with NEW text
    recrawl_url = corp.iloc[0]["url"]
    wave = corp.iloc[40:55].copy()
    re_row = corp.iloc[[0]].copy()
    re_row["text"] = "freshly recrawled body text"
    import pandas as pd

    wave = pd.concat([wave, re_row], ignore_index=True)
    assert ingest_batch(
        spark.createDataFrame(wave), 0, idx, n_shards=2, n_tbuckets=4
    ) is not None
    # pre-merge: both versions visible in the raw union
    import pandas as pd
    rid = int(sha1_doc_id(pd.Series([recrawl_url]))[0])
    texts = {
        r["segment_id"]: r["text"]
        for r in load_source(spark, idx).where(
            f"doc_id = {rid}"
        ).collect()
    }
    assert len(texts) == 2

    victim = int(sha1_doc_id(pd.Series([corp.iloc[1]["url"]]))[0])
    delete_docs(spark, idx, [victim])
    merge_segments(spark, idx)

    src = {r["doc_id"]: r["text"] for r in load_source(spark, idx).collect()}
    assert src[rid] == "freshly recrawled body text"
    assert victim not in src
    assert len(src) == 40 + 15 - 1  # recrawl dedup + delete
    # and source_pages applies the same visibility rule
    pages = {r["doc_id"]: r["text"]
             for r in source_pages(spark, idx).collect()}
    assert pages == src


def test_merge_rejects_mixed_source_segments(spark, tmp_path):
    from sparkfts.merge import merge_segments
    from sparkfts.streaming import ingest_batch

    corp = gen_corpus(30, seed=9).to_pandas()
    idx = os.path.join(str(tmp_path), "mixed")
    build_index(
        spark.createDataFrame(corp.iloc[:20]), idx,
        n_shards=2, n_tbuckets=4, store_source=True,
    )
    # explicit override breaks the inheritance — merge must fail loud
    ingest_batch(
        spark.createDataFrame(corp.iloc[20:]), 0, idx,
        n_shards=2, n_tbuckets=4, store_source=False,
    )
    with pytest.raises(ValueError, match="_source"):
        merge_segments(spark, idx)


def test_rollover_conditions_and_alias_append(spark, src_index, tmp_path):
    from sparkfts.multiindex import resolve, put_alias

    reg = os.path.join(str(tmp_path), "reg")
    put_alias(reg, "logs", [src_index])
    nxt = os.path.join(str(tmp_path), "logs-000002")

    with pytest.raises(ValueError, match="condition"):
        rollover(spark, reg, "logs", nxt)
    with pytest.raises(KeyError):
        rollover(spark, reg, "nope", nxt, max_docs=1)

    r = rollover(spark, reg, "logs", nxt, max_docs=10_000)
    assert r["rolled"] is False and r["write_index"] == src_index
    assert resolve(reg, "logs") == [src_index]
    assert r["conditions"]["max_docs"]["current"] == 150

    r = rollover(spark, reg, "logs", nxt, max_docs=100)
    assert r["rolled"] is True and r["write_index"] == nxt
    assert resolve(reg, "logs") == [src_index, nxt]

    # duplicate target rejected
    with pytest.raises(ValueError, match="already"):
        rollover(spark, reg, "logs", nxt, max_docs=1)

    # the rolled-to dir is created by the first append; the alias then
    # searches across old + new via the cross-index merge
    from sparkfts.multiindex import search_alias
    from sparkfts.streaming import ingest_batch

    wave = gen_corpus(25, seed=77).to_pandas()
    assert ingest_batch(
        spark.createDataFrame(wave), 0, nxt, n_shards=2, n_tbuckets=4
    ) is not None
    res = search_alias(spark, reg, "logs", [(0, "the", 5)], mode="or")
    assert res.count() == 5

    # max_bytes condition path
    r = rollover(
        spark, reg, "logs", os.path.join(str(tmp_path), "logs-000003"),
        max_bytes=1,
    )
    assert r["rolled"] is True
    assert r["conditions"]["max_bytes"]["current"] > 1


# ---- snapshot / restore (ES _snapshot repository surface) ----


def test_snapshot_restore_roundtrip(spark, tmp_path):
    import shutil

    from sparkfts.index import build_index
    from sparkfts.lifecycle import (
        list_snapshots,
        restore_snapshot,
        snapshot,
    )
    from sparkfts.query import bm25_index_batch
    from sparkfts.synth import gen_corpus

    idx = str(tmp_path / "snap_idx")
    repo = str(tmp_path / "repo")
    build_index(
        spark.createDataFrame(gen_corpus(120, seed=51).to_pandas()),
        idx, n_shards=2, n_tbuckets=4,
    )
    base = bm25_index_batch(spark, idx, [(0, "the", 10)], mode="or").collect()
    assert base

    s1 = snapshot(idx, repo, "s1")
    assert s1["linked"] == 0 and s1["n_files"] > 0
    assert [s["name"] for s in list_snapshots(repo)] == ["s1"]

    # mutate the live index (delete the top hit) -> snapshot is PIT
    from sparkfts.deletes import delete_docs

    delete_docs(spark, idx, [base[0]["doc_id"]])
    after = bm25_index_batch(spark, idx, [(0, "the", 10)], mode="or").collect()
    assert after[0]["doc_id"] != base[0]["doc_id"]

    restored = str(tmp_path / "restored_idx")
    restore_snapshot(repo, "s1", restored)
    got = bm25_index_batch(
        spark, restored, [(0, "the", 10)], mode="or"
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in base
    ]

    # second snapshot after the mutation: unchanged files hard-link
    s2 = snapshot(idx, repo, "s2")
    assert s2["linked"] > 0
    assert [s["name"] for s in list_snapshots(repo)] == ["s1", "s2"]

    # duplicate name / existing target / corruption all fail loud
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        snapshot(idx, repo, "s1")
    with _pytest.raises(FileExistsError):
        restore_snapshot(repo, "s1", restored)
    victim = None
    import os as _os

    for dirpath, _d, files in _os.walk(_os.path.join(repo, "s2")):
        for fn in files:
            if fn.endswith(".parquet"):
                victim = _os.path.join(dirpath, fn)
                break
        if victim:
            break
    # corrupt a COPIED (not hard-linked) file representative: rewrite
    # via a fresh inode so s1 stays intact
    data = open(victim, "rb").read()
    _os.unlink(victim)
    with open(victim, "wb") as f:
        f.write(data[: max(0, len(data) - 7)] + b"corrupt")
    with _pytest.raises(ValueError, match="corrupt"):
        restore_snapshot(repo, "s2", str(tmp_path / "x"))


def test_field_caps(spark, pages_df, tmp_path_factory):
    from pyspark.sql import functions as F

    from sparkfts.index import build_index
    from sparkfts.lifecycle import field_caps

    base = tmp_path_factory.mktemp("fcaps")
    a, b = str(base / "a"), str(base / "b")
    build_index(
        pages_df.withColumn("n_chars", F.length("text")), a,
        n_shards=2, n_tbuckets=4, docvalue_cols=["lang", "n_chars"],
    )
    # index b: same field name, DIFFERENT type -> conflict
    build_index(
        pages_df.withColumn("n_chars", F.length("text").cast("string")),
        b, n_shards=2, n_tbuckets=4, docvalue_cols=["n_chars"],
    )
    caps = field_caps(spark, [a, b])
    assert caps["text"]["searchable"] and not caps["text"]["aggregatable"]
    assert caps["doc_id"]["aggregatable"]
    assert caps["lang"]["aggregatable"]
    assert caps["lang"]["indices"] == [a]
    assert caps["n_chars"]["type"] == "conflict"
    assert set(caps["n_chars"]["types"].values()) == {"int", "string"}
    assert "types" not in caps["doc_id"]  # uniform types collapse
    import pytest as _p

    with _p.raises(ValueError):
        field_caps(spark, [])


def test_shrink_and_split(spark, pages_df, queries, tmp_path_factory):
    from sparkfts.index import read_meta
    from sparkfts.lifecycle import shrink
    from sparkfts.query import bm25_index_batch

    base = tmp_path_factory.mktemp("shrink")
    src = str(base / "src")
    from sparkfts.index import build_index

    build_index(pages_df, src, n_shards=4, n_tbuckets=4,
                store_source=True)
    small = str(base / "small")
    meta = shrink(spark, src, small, n_shards=2)
    assert meta["n_shards"] == 2
    assert read_meta(small)["n_docs"] == read_meta(src)["n_docs"]
    q = queries[0]["query"]
    a = bm25_index_batch(spark, src, [(0, q, 10)], mode="or").collect()
    b = bm25_index_batch(spark, small, [(0, q, 10)], mode="or").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    big = str(base / "big")
    meta = shrink(spark, src, big, n_shards=8)
    assert meta["n_shards"] == 8
    c = bm25_index_batch(spark, big, [(0, q, 10)], mode="or").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in c]
    for bad in (3, 4, 0):
        with pytest.raises(ValueError):
            shrink(spark, src, str(base / f"bad{bad}"), n_shards=bad)


def test_update_by_query(spark, pages_df, queries, tmp_path_factory):
    from sparkfts.index import build_index
    from sparkfts.lifecycle import update_by_query
    from sparkfts.query import bm25_index_batch
    from sparkfts.searcher import Searcher

    base = tmp_path_factory.mktemp("ubq")
    idx = str(base / "idx")
    build_index(pages_df, idx, n_shards=2, n_tbuckets=4,
                store_source=True)
    q = queries[0]["query"]
    term = q.split()[0]
    before = bm25_index_batch(spark, idx, [(0, term, 10_000)],
                              mode="or").collect()
    assert before, "premise: the term matches"
    # rewrite matching docs: strip the term entirely from their text
    res = update_by_query(
        spark, idx, term,
        [{"gsub": {"field": "text",
                   "pattern": f"\\b{term}\\b", "replacement": "zzqx"}}],
        mode="or",
    )
    assert res["matched"] == len({r["doc_id"] for r in before})
    assert res["segment"].startswith("stream_")
    # replacement text is visible immediately (new segment indexed)
    repl0 = bm25_index_batch(spark, idx, [(0, "zzqx", 10_000)],
                             mode="or").collect()
    assert {r["doc_id"] for r in repl0} == {r["doc_id"] for r in before}
    # old-only terms disappear at MERGE (the engine's documented
    # supersede-at-merge contract, same as re-crawled docs)
    from sparkfts.merge import merge_segments

    merge_segments(spark, idx)
    after = bm25_index_batch(spark, idx, [(0, term, 10_000)],
                             mode="or").collect()
    assert after == []
    repl = bm25_index_batch(spark, idx, [(0, "zzqx", 10_000)],
                            mode="or").collect()
    assert {r["doc_id"] for r in repl} == {r["doc_id"] for r in before}
    # warm serving still opens post-merge
    s = Searcher(spark, idx)
    s.close()
    # guards
    import pytest as _p

    noop = update_by_query(spark, idx, "zzzznotaterm",
                           [{"set": {"field": "x", "value": 1}}])
    assert noop == {"matched": 0, "updated": 0, "segment": None}
    with _p.raises(ValueError):
        # 'zzqx' still matches post-update; dropping text must refuse
        update_by_query(spark, idx, "zzqx",
                        [{"remove": {"field": "text"}}])
    idx2 = str(base / "nosource")
    build_index(pages_df, idx2, n_shards=2, n_tbuckets=4)
    with _p.raises(ValueError):
        update_by_query(spark, idx2, term, [])
    # r4 ADVICE: non-sha1 ids must fail loud BEFORE committing a segment
    # (re-ingest would re-derive different ids -> silent duplication)
    from pyspark.sql import functions as F

    idx3 = str(base / "columnids")
    col_pages = pages_df.withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    meta3 = build_index(col_pages, idx3, n_shards=2, n_tbuckets=4,
                        store_source=True, id_source="column")
    assert meta3["id_source"] == "column"  # persisted in meta (r5)
    with _p.raises(ValueError, match="sha1"):
        update_by_query(spark, idx3, term,
                        [{"set": {"field": "x", "value": 1}}], mode="or")
