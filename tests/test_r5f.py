"""Round-5 wave-6: cumulative_cardinality, percentiles_bucket,
children/parent aggregation scopes — python mirrors + contract pins."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_cumulative_cardinality_mirror(spark):
    """Exact pin: cumulative_cardinality[i] == true distinct count of
    values in buckets <= i; first_seen attributes each value to its
    min bucket; null values ignored; empty buckets carry forward."""
    from sparkfts.pipelineaggs import cumulative_cardinality

    rng = np.random.Generator(np.random.PCG64(7))
    rows = [
        (int(b), int(v) if v >= 0 else None)
        for b, v in zip(
            rng.integers(0, 12, 400), rng.integers(-3, 25, 400)
        )
    ]
    df = spark.createDataFrame(rows, "b long, v long")
    got = {
        r["bucket"]: (r["first_seen"], r["cumulative_cardinality"])
        for r in cumulative_cardinality(df, "b", "v").collect()
    }
    buckets = sorted({b for b, _ in rows})
    assert set(got) == set(buckets)
    seen: set = set()
    for b in buckets:
        new = {
            v for bb, v in rows if bb == b and v is not None
        } - seen
        # first_seen counts values whose MIN bucket is b
        firsts = sum(
            1
            for v in {v for _, v in rows if v is not None}
            if min(bb for bb, vv in rows if vv == v) == b
        )
        seen |= {v for bb, v in rows if bb == b and v is not None}
        assert got[b][0] == firsts, b
        assert got[b][1] == len(seen), b


def test_cumulative_cardinality_empty_bucket_carries(spark):
    df = spark.createDataFrame(
        [(0, 1), (0, 2), (1, None), (2, 1), (3, 3)], "b long, v long"
    )
    from sparkfts.pipelineaggs import cumulative_cardinality

    rows = {
        r["bucket"]: (r["first_seen"], r["cumulative_cardinality"])
        for r in cumulative_cardinality(df, "b", "v").collect()
    }
    assert rows == {0: (2, 2), 1: (0, 2), 2: (0, 2), 3: (1, 3)}


def test_percentiles_bucket_mirror(spark):
    """Exact percentile_cont interpolation over the bucket metric
    (numpy 'linear' is the same definition)."""
    from sparkfts.pipelineaggs import percentiles_bucket

    vals = [3.0, 17.0, 1.0, 9.0, 4.0, 22.0, 8.0]
    buckets = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "bucket long, m double"
    )
    pcts = [0.0, 10.0, 50.0, 90.0, 100.0]
    got = {
        r["pct"]: r["value"]
        for r in percentiles_bucket(buckets, "m", pcts).collect()
    }
    for p in pcts:
        want = float(np.percentile(vals, p, method="linear"))
        assert got[p] == pytest.approx(want, abs=1e-12), p
    with pytest.raises(ValueError):
        percentiles_bucket(buckets, "m", [101.0])


def test_children_parent_scopes(spark):
    """Scope-switch semantics: children of matching parents (no
    duplication/widening), distinct parents of matching children."""
    from sparkfts.parentjoin import children_scope, parent_scope

    parents = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "pk long, tag string"
    )
    children = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12), (3, 13), (4, 14)],
        "fk long, val long",
    )
    got = sorted(
        (r["fk"], r["val"])
        for r in children_scope(
            parents, children, "pk", "fk", "tag = 'a'"
        ).collect()
    )
    assert got == [(1, 10), (1, 11), (3, 13)]
    # columns: child columns only (semi join never widens)
    assert children_scope(
        parents, children, "pk", "fk", "tag = 'a'"
    ).columns == ["fk", "val"]

    # parent_scope: parent 1 has TWO matching children but appears once
    got = sorted(
        r["pk"]
        for r in parent_scope(
            parents, children, "pk", "fk", "val <= 12"
        ).collect()
    )
    assert got == [1, 2]
    assert parent_scope(
        parents, children, "pk", "fk", "val <= 12"
    ).columns == ["pk", "tag"]


def test_children_scope_then_subagg_matches_sql(spark):
    """The entry shape: scope switch + terms sub-agg == plain SQL."""
    from sparkfts.parentjoin import children_scope

    rng = np.random.Generator(np.random.PCG64(11))
    parents = spark.createDataFrame(
        [(int(i), int(rng.integers(0, 2))) for i in range(50)],
        "pk long, flag long",
    )
    children = spark.createDataFrame(
        [
            (int(rng.integers(0, 60)), ["x", "y", "z"][int(rng.integers(0, 3))])
            for _ in range(300)
        ],
        "fk long, cat string",
    )
    parents.createOrReplaceTempView("p5f")
    children.createOrReplaceTempView("c5f")
    got = sorted(
        (r["cat"], r["n"])
        for r in children_scope(parents, children, "pk", "fk", "flag = 1")
        .groupBy("cat")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = sorted(
        (r["cat"], r["n"])
        for r in spark.sql(
            "SELECT cat, count(*) n FROM c5f WHERE fk IN "
            "(SELECT pk FROM p5f WHERE flag = 1) GROUP BY cat"
        ).collect()
    )
    assert got == want and got


@pytest.fixture(scope="module")
def ff_index(spark, corpus, tmp_path_factory):
    from sparkfts.index import build_index

    d = str(tmp_path_factory.mktemp("ff_idx"))
    build_index(
        spark.createDataFrame(corpus.to_pandas()), d,
        n_shards=4, n_tbuckets=8,
    )
    return d


def test_fixed_fuzziness_kernel_vs_mirror(spark, corpus, ff_index):
    """Clause(fuzziness='1'/'2') executes a FIXED-distance expansion in
    the bool-tree kernel — mirrored brute-force over the corpus (the
    oracle.fuzzy scoring pin with maxd pinned, not the AUTO ladder)."""
    from collections import Counter

    from sparkfts.analysis import tokenize
    from sparkfts.booltree import bool_topk_batch
    from sparkfts.querybuilder import Clause, SearchRequest
    from sparkfts.stats import idf as idf_fn
    from sparkfts.tokens import prepare_pages

    prepared = prepare_pages(
        spark.createDataFrame(corpus.to_pandas())
    ).select("doc_id", "text").collect()
    toks = {r["doc_id"]: tokenize(r["text"]) for r in prepared}
    n_docs = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    df = Counter()
    for tk in toks.values():
        for t in set(tk):
            df[t] += 1

    import numpy as np

    def lev(a, b):
        la, lb = len(a), len(b)
        d = np.arange(lb + 1)
        for i in range(1, la + 1):
            prev, d[0] = d[0], i
            for j in range(1, lb + 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1,
                    prev + (a[i - 1] != b[j - 1]),
                )
        return int(d[lb])

    q = "worde"  # 5 chars: AUTO would give 1; test 1 vs 2 explicitly
    for maxd in (1, 2):
        req = SearchRequest(
            clauses=(Clause(query=q, fuzziness=str(maxd)),), k=15
        )
        got = bool_topk_batch(spark, ff_index, [req]).collect()

        exps = [
            (t, (1.0 - lev(q, t) / len(q)) * idf_fn(n_docs, c))
            for t, c in df.items()
            if abs(len(t) - len(q)) <= maxd and lev(q, t) <= maxd
        ]
        expect = []
        for d_id, tk in toks.items():
            best = 0.0
            hit = False
            for t, w in exps:
                tf = tk.count(t)
                if not tf:
                    continue
                hit = True
                dl = len(tk)
                s = w * (
                    tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                ) * 2.2
                best = max(best, s)
            if hit:
                expect.append((d_id, best))
        expect.sort(key=lambda x: (-x[1], x[0]))
        expect = expect[:15]
        assert [(r["doc_id"]) for r in got] == [d for d, _ in expect], maxd
        assert np.allclose(
            [r["score"] for r in got], [s for _, s in expect], atol=1e-9
        )
        assert expect, "no fuzzy matches — corpus drifted"


def test_fixed_fuzziness_monotone_and_validation(spark, corpus, ff_index):
    """match set (maxd=1) ⊆ (maxd=2); bad fuzziness fails loud."""
    from sparkfts.booltree import bool_matches_batch, bool_topk_batch
    from sparkfts.querybuilder import Clause, SearchRequest

    q = "worde"
    sets = {}
    for maxd in ("1", "2"):
        req = SearchRequest(clauses=(Clause(query=q, fuzziness=maxd),), k=1)
        sets[maxd] = {
            r["doc_id"]
            for r in bool_matches_batch(spark, ff_index, [req]).collect()
        }
    assert sets["1"] <= sets["2"]
    with pytest.raises(ValueError, match="fuzziness"):
        bool_topk_batch(
            spark, ff_index,
            [SearchRequest(clauses=(Clause(query=q, fuzziness="3"),), k=5)],
        )


def test_simpleqs_fixed_fuzziness(spark, corpus, ff_index):
    """simple_query_string ~1/~2 == fixed-distance clauses; ~5 caps."""
    from sparkfts.booltree import bool_topk_batch
    from sparkfts.querybuilder import Clause, SearchRequest
    from sparkfts.simpleqs import (
        parse_simple_query_string,
        simple_query_string_topk_batch,
    )

    t = parse_simple_query_string("worde~1 | other~5")
    assert [c.fuzziness for c in t.should] == ["1", "2"]
    got = simple_query_string_topk_batch(
        spark, ff_index, [(0, "worde~2", 10)]
    ).collect()
    want = bool_topk_batch(
        spark, ff_index,
        [SearchRequest(clauses=(Clause(query="worde", fuzziness="2"),),
                       k=10)],
    ).collect()
    assert [tuple(r)[1:] for r in got] == [tuple(r)[1:] for r in want]
