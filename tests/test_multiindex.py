"""Cross-index search + aliases (sparkfts.multiindex).

Pinned semantics (multiindex.py docstring): each index scores with its
OWN stats (query-then-fetch); global merge ties (-score, index_ord asc,
doc_id asc); rank is global. Brute force = per-index full rankings from
the already-oracle-pinned single-index kernel, merged in pandas.
"""

from __future__ import annotations

import pytest

from sparkfts.analysis import tokenize
from sparkfts.index import build_index
from sparkfts.multiindex import (
    bm25_multi_index_batch,
    delete_alias,
    put_alias,
    resolve,
    search_alias,
)
from sparkfts.query import bm25_index_batch
from sparkfts.synth import gen_corpus


@pytest.fixture(scope="module")
def two_indexes(spark, tmp_path_factory):
    """Two disjoint time-slices of one corpus, indexed separately."""
    root = tmp_path_factory.mktemp("mi")
    corp = gen_corpus(300, seed=77).to_pandas()
    a, b = corp.iloc[:180], corp.iloc[180:]
    dirs = [str(root / "idx_a"), str(root / "idx_b")]
    build_index(spark.createDataFrame(a), dirs[0], n_shards=3, n_tbuckets=8)
    build_index(spark.createDataFrame(b), dirs[1], n_shards=2, n_tbuckets=8)
    return dirs, corp


def _common_terms(texts, n=2):
    from collections import Counter

    c: Counter = Counter()
    for t in texts:
        c.update(set(tokenize(t)))
    return [t for t, _ in c.most_common(n)]


def _brute_merge(spark, dirs, query, mode, k):
    rows = []
    for ord_, d in enumerate(dirs):
        for r in bm25_index_batch(
            spark, d, [(0, query, 10_000)], mode=mode
        ).collect():
            rows.append((ord_, r["doc_id"], r["score"]))
    rows.sort(key=lambda x: (-x[2], x[0], x[1]))
    return [
        (i + 1, ord_, doc, score)
        for i, (ord_, doc, score) in enumerate(rows[:k])
    ]


def test_multi_index_merge_exact(spark, two_indexes):
    dirs, corp = two_indexes
    q = " ".join(_common_terms(corp["text"].tolist()))
    for mode in ("and", "or"):
        got = (
            bm25_multi_index_batch(spark, dirs, [(0, q, 12)], mode=mode)
            .orderBy("rank")
            .collect()
        )
        exp = _brute_merge(spark, dirs, q, mode, 12)
        assert [
            (r["rank"], r["index_ord"], r["doc_id"], r["score"]) for r in got
        ] == exp, mode


def test_multi_index_per_index_stats(spark, two_indexes):
    """Scores come from index-LOCAL stats: the same doc_id scored in the
    merged run equals its single-index score (no stat globalization)."""
    dirs, corp = two_indexes
    q = _common_terms(corp["text"].tolist(), 1)[0]
    merged = {
        (r["index_ord"], r["doc_id"]): r["score"]
        for r in bm25_multi_index_batch(
            spark, dirs, [(0, q, 10_000)], mode="or"
        ).collect()
    }
    for ord_, d in enumerate(dirs):
        solo = {
            r["doc_id"]: r["score"]
            for r in bm25_index_batch(
                spark, d, [(0, q, 10_000)], mode="or"
            ).collect()
        }
        for doc, score in solo.items():
            assert merged[(ord_, doc)] == score


def test_multi_index_tie_breaks_on_index_ord(spark, tmp_path_factory):
    """Identical corpora in both indexes -> every score ties exactly;
    the merged ranking must interleave (index_ord asc, doc_id asc)."""
    root = tmp_path_factory.mktemp("mi_tie")
    corp = gen_corpus(80, seed=5).to_pandas()
    dirs = [str(root / "t0"), str(root / "t1")]
    for d in dirs:
        build_index(spark.createDataFrame(corp), d, n_shards=2, n_tbuckets=4)
    q = _common_terms(corp["text"].tolist(), 1)[0]
    got = (
        bm25_multi_index_batch(spark, dirs, [(0, q, 8)], mode="or")
        .orderBy("rank")
        .collect()
    )
    assert len(got) == 8
    for i in range(0, 8, 2):
        a, b = got[i], got[i + 1]
        assert a["score"] == b["score"]
        assert a["doc_id"] == b["doc_id"]
        assert (a["index_ord"], b["index_ord"]) == (0, 1)


def test_multi_index_rejects_pagination_kwargs(spark, two_indexes):
    dirs, _ = two_indexes
    with pytest.raises(ValueError, match="offset"):
        bm25_multi_index_batch(spark, dirs, [(0, "web", 5)], offset=3)
    with pytest.raises(ValueError, match="search_after"):
        bm25_multi_index_batch(
            spark, dirs, [(0, "web", 5)], search_after=[(0, 1.0, 3)]
        )
    with pytest.raises(ValueError, match="non-empty"):
        bm25_multi_index_batch(spark, [], [(0, "web", 5)])


def test_alias_registry_roundtrip(tmp_path):
    reg = str(tmp_path / "reg")
    put_alias(reg, "logs", ["/i/a", "/i/b"])
    put_alias(reg, "hot", ["/i/b"])
    assert resolve(reg, "logs") == ["/i/a", "/i/b"]
    assert resolve(reg, "hot") == ["/i/b"]
    # non-alias names resolve to themselves (literal dir)
    assert resolve(reg, "/i/zzz") == ["/i/zzz"]
    put_alias(reg, "logs", ["/i/c"])  # replace
    assert resolve(reg, "logs") == ["/i/c"]
    delete_alias(reg, "hot")
    assert resolve(reg, "hot") == ["hot"]
    with pytest.raises(KeyError):
        delete_alias(reg, "hot")
    with pytest.raises(ValueError):
        put_alias(reg, "empty", [])


def test_search_alias_single_and_multi(spark, two_indexes, tmp_path):
    dirs, corp = two_indexes
    reg = str(tmp_path / "reg")
    put_alias(reg, "all", dirs)
    put_alias(reg, "recent", [dirs[1]])
    q = " ".join(_common_terms(corp["text"].tolist()))

    multi = search_alias(spark, reg, "all", [(0, q, 9)], mode="or")
    exp = _brute_merge(spark, dirs, q, "or", 9)
    assert [
        (r["rank"], r["index_ord"], r["doc_id"], r["score"])
        for r in multi.orderBy("rank").collect()
    ] == exp

    # single-target alias keeps the single-index plan/output shape
    single = search_alias(spark, reg, "recent", [(0, q, 9)], mode="or")
    assert "index_ord" not in single.columns
    direct = bm25_index_batch(spark, dirs[1], [(0, q, 9)], mode="or")
    assert sorted(map(tuple, single.collect())) == sorted(
        map(tuple, direct.collect())
    )
