"""Warm Searcher returns results identical to the cold index query path."""

from __future__ import annotations

import pytest

from sparkfts.index import build_index
from sparkfts.query import bm25_index_batch
from sparkfts.searcher import Searcher


@pytest.fixture(scope="module")
def index_dir(spark, pages_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("searcher_idx"))
    build_index(pages_df, d, n_shards=4, n_tbuckets=8)
    return d


def test_searcher_matches_cold_path(spark, index_dir, queries):
    batch = [(q["query_id"], q["query"], q["k"]) for q in queries[:10]]
    cold = bm25_index_batch(spark, index_dir, batch).collect()
    s = Searcher(spark, index_dir)
    s.warmup()
    try:
        warm = s.search_batch(batch).collect()
        # repeat with the df LRU warm: identical again
        warm2 = s.search_batch(batch).collect()
    finally:
        s.close()
    as_tuples = lambda rows: [  # noqa: E731
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in rows
    ]
    assert as_tuples(cold) == as_tuples(warm) == as_tuples(warm2)


def test_searcher_df_lru(spark, index_dir, queries):
    s = Searcher(spark, index_dir, df_cache_size=3)
    try:
        d1 = s.term_dfs(["a", "b"])
        d2 = s.term_dfs(["a", "b"])  # cache hit path
        assert d1 == d2
        s.term_dfs(["c", "d"])  # evicts beyond capacity
        assert len(s._df_lru) <= 3
        assert s.term_dfs(["zzqqxxnotaword"]) == {"zzqqxxnotaword": 0}
    finally:
        s.close()


def test_pagination_offset(spark, index_dir, queries, oracle=None):
    """offset pages tile the oracle's full ranking with no gaps/overlaps."""
    from sparkfts.query import bm25_index_batch

    q = queries[0]["query"]
    full = bm25_index_batch(spark, index_dir, [(0, q, 30)]).collect()
    pages = []
    for off in (0, 10, 20):
        page = bm25_index_batch(
            spark, index_dir, [(0, q, 10)], offset=off
        ).collect()
        assert [r["rank"] for r in page] == list(range(off + 1, off + 1 + len(page)))
        pages.extend(page)
    assert [(r["rank"], r["doc_id"]) for r in pages] == [
        (r["rank"], r["doc_id"]) for r in full[: len(pages)]
    ]

    s = Searcher(spark, index_dir)
    try:
        warm = s.search_batch([(0, q, 10)], offset=10).collect()
    finally:
        s.close()
    assert [(r["rank"], r["doc_id"]) for r in warm] == [
        (r["rank"], r["doc_id"]) for r in full[10:20]
    ]


def test_local_fast_path_identical_to_distributed(spark, index_dir, queries):
    """Coordinator fast path returns byte-identical results to the
    distributed kernels for every query and both modes."""
    batch = [(q["query_id"], q["query"], q["k"]) for q in queries[:10]]
    fast = Searcher(spark, index_dir, local_threshold=10**9)
    slow = Searcher(spark, index_dir, local_threshold=0)
    try:
        for mode in ("and", "or"):
            a = fast.search_batch(batch, mode=mode).collect()
            b = slow.search_batch(batch, mode=mode).collect()
            assert [tuple(r) for r in a] == [tuple(r) for r in b], mode
        # offset parity too
        a = fast.search_batch(batch[:1], offset=5).collect()
        b = slow.search_batch(batch[:1], offset=5).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
    finally:
        fast.close()
        slow.close()


def test_search_rows_fast_and_identical(spark, index_dir, queries):
    import time

    s = Searcher(spark, index_dir, local_threshold=10**9)
    try:
        q = queries[0]["query"]
        rows = s.search_rows([(0, q, 10)])  # warm caches
        via_df = [
            tuple(r) for r in s.search_batch([(0, q, 10)]).collect()
        ]
        assert rows == via_df
        t0 = time.time()
        for _ in range(10):
            s.search_rows([(0, q, 10)])
        per = (time.time() - t0) / 10
    finally:
        s.close()
    # warm repeats skip Spark jobs AND DataFrame wrapping entirely
    assert per < 0.2, f"fast path took {per:.4f}s per query"


def test_mixed_batch_splits_local_and_distributed(spark, index_dir, queries):
    """A batch whose queries straddle the df threshold returns the same
    rows as a fully-distributed run, in (query_id, rank) order."""
    batch = [(q["query_id"], q["query"], q["k"]) for q in queries[:8]]
    # threshold of 1: everything is "heavy" except empty-term queries
    # pick a mid threshold so some queries go local, some distributed
    dfs = []
    ref = Searcher(spark, index_dir, local_threshold=0)
    try:
        expected = ref.search_rows(batch)
        from sparkfts.analysis import tokenize_query

        per_q = []
        for qid, text, k in batch:
            terms = tokenize_query(text)
            dfm = ref.term_dfs(terms) if terms else {}
            per_q.append(sum(dfm.values()))
        mid = sorted(per_q)[len(per_q) // 2] or 1
    finally:
        ref.close()
    mixed = Searcher(spark, index_dir, local_threshold=mid)
    try:
        got = mixed.search_rows(batch)
    finally:
        mixed.close()
    assert got == expected


def test_search_after_pages_match_offset(spark, index_dir, queries):
    """search_after cursor pages must reproduce offset pages exactly, on
    the distributed path and the coordinator fast path, both modes."""
    from sparkfts.query import bm25_index_batch
    from sparkfts.searcher import Searcher

    q = queries[0]["query"]
    for mode in ("and", "or"):
        full = bm25_index_batch(
            spark, index_dir, [(0, q, 12)], mode=mode
        ).collect()
        if len(full) < 6:
            continue
        cursor = (full[3]["score"], full[3]["doc_id"])
        page2 = bm25_index_batch(
            spark, index_dir, [(0, q, 4)], mode=mode,
            search_after={0: cursor},
        ).collect()
        assert [r["doc_id"] for r in page2] == [
            r["doc_id"] for r in full[4:8]
        ], f"distributed mode={mode}"
        assert [r["rank"] for r in page2] == [1, 2, 3, 4][: len(page2)]

        s = Searcher(spark, index_dir)
        try:
            local = s.search_rows([(0, q, 4)], mode=mode,
                                  search_after={0: cursor})
            assert [r[2] for r in local] == [r["doc_id"] for r in full[4:8]]
            # distributed serving path too (force past the df gate)
            s.local_threshold = 0
            dist = s.search_rows([(0, q, 4)], mode=mode,
                                 search_after={0: cursor})
            assert [r[2] for r in dist] == [r["doc_id"] for r in full[4:8]]
        finally:
            s.close()


def test_search_after_offset_mutually_exclusive(spark, index_dir):
    import pytest as _pytest

    from sparkfts.query import bm25_index_batch

    with _pytest.raises(ValueError, match="mutually exclusive"):
        bm25_index_batch(
            spark, index_dir, [(0, "x", 5)], offset=5,
            search_after={0: (1.0, 2)},
        )


# ---- scroll / point-in-time pagination ----


def test_scroll_pages_equal_one_shot(spark, index_dir, queries):
    s = Searcher(spark, index_dir)
    q = queries[0]["query"]
    full = s.search_rows([(0, q, 10_000)], mode="or")
    sc = s.scroll(q, size=7, mode="or")
    paged = []
    for page in sc:
        assert len(page) <= 7
        paged.extend(page)
    assert [(r[0], r[1], r[2]) for r in paged] == [
        (rank, doc_id, score) for _, rank, doc_id, score in full
    ]
    # exhausted cursor stays exhausted
    assert sc.next_page() == []
    s.close()


def test_scroll_ranks_continue_and_pages_disjoint(spark, index_dir,
                                                  queries):
    s = Searcher(spark, index_dir)
    sc = s.scroll(queries[1]["query"], size=5, mode="or")
    p1, p2 = sc.next_page(), sc.next_page()
    if p2:
        assert p1[-1][0] + 1 == p2[0][0]  # ranks continue
        assert {d for _, d, _ in p1}.isdisjoint({d for _, d, _ in p2})
    with pytest.raises(ValueError):
        s.scroll("x", size=0)
    s.close()


def test_scroll_is_point_in_time(spark, pages_df, queries,
                                 tmp_path_factory):
    """Docs ingested after the Searcher opened don't enter an in-flight
    scroll (ES scroll-context semantics)."""
    import pandas as pd

    from sparkfts.streaming import ingest_batch

    d = str(tmp_path_factory.mktemp("scroll_pit_idx"))
    pdf = pages_df.toPandas()
    ingest_batch(spark.createDataFrame(pdf), 0, d, n_shards=2,
                 n_tbuckets=4)
    s = Searcher(spark, d)
    s.warmup()
    q = queries[0]["query"]
    sc = s.scroll(q, size=4, mode="or")
    first = sc.next_page()
    # ingest a new segment that WOULD match
    extra = pdf.iloc[:3].copy()
    extra["url"] = extra["url"] + "?v=2"
    ingest_batch(spark.createDataFrame(extra), 1, d, n_shards=2,
                 n_tbuckets=4)
    rest = [r for page in sc for r in page]
    all_ids = {doc for _, doc, _ in first} | {doc for _, doc, _ in rest}
    # a FRESH searcher sees more matches than the scroll did
    s2 = Searcher(spark, d)
    fresh = {r[2] for r in s2.search_rows([(0, q, 10_000)], mode="or")}
    assert all_ids <= fresh
    assert len(fresh) > len(all_ids)
    s.close()
    s2.close()
