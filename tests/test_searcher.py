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
