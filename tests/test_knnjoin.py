"""kNN join vs brute-force python mirror."""

from __future__ import annotations

import math

import numpy as np
import pytest

from sparkfts.ops.knnjoin import knn_join


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.Generator(np.random.PCG64(23))
    rows = [
        (i, [float(x) for x in rng.normal(size=12)]) for i in range(30)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ), rows


def _q(v):
    return [math.floor(x * 1000 + 0.5) for x in v]


def _cos_e6(a, b):
    qa, qb = _q(a), _q(b)
    na = math.sqrt(sum(x * x for x in qa))
    nb = math.sqrt(sum(x * x for x in qb))
    if na == 0 or nb == 0:
        return None
    return math.floor(
        sum(x * y for x, y in zip(qa, qb)) / (na * nb) * 1_000_000 + 0.5
    )


def _brute(rows_a, rows_b, k, exclude_self=True):
    out = {}
    for aid, av in rows_a:
        cand = []
        for bid, bv in rows_b:
            if exclude_self and aid == bid:
                continue
            c = _cos_e6(av, bv)
            if c is not None:
                cand.append((-c, bid))
        cand.sort()
        out[aid] = [(bid, -nc) for nc, bid in cand[:k]]
    return out


def test_exact_knn_join_matches_brute(emb):
    df, rows = emb
    got: dict[int, list] = {}
    for r in knn_join(df, df, k=3, method="exact").collect():
        got.setdefault(r["a_id"], []).append((r["b_id"], r["cos_e6"]))
    assert got == _brute(rows, rows, 3)


def test_lsh_knn_join_subset_of_exact(emb):
    df, rows = emb
    exact = _brute(rows, rows, 1000)
    got = knn_join(df, df, k=3, method="lsh", n_planes=3).collect()
    assert got, "buckets must collide at 3 planes"
    exact_map = {
        (aid, bid): c for aid, pairs in exact.items() for bid, c in pairs
    }
    for r in got:
        # every LSH result is a true pair with the exact score
        assert exact_map[(r["a_id"], r["b_id"])] == r["cos_e6"]
    # per-a ranks are 1..n and scores descend
    by_a: dict[int, list] = {}
    for r in got:
        by_a.setdefault(r["a_id"], []).append(r)
    for aid, rs in by_a.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        cs = [r["cos_e6"] for r in rs]
        assert cs == sorted(cs, reverse=True)


def test_knn_join_cross_tables_and_self(emb, spark):
    df, rows = emb
    a = df.where("vec_id < 10")
    b = df.where("vec_id >= 10")
    got = knn_join(a, b, k=2, method="exact").collect()
    exp = _brute(
        [r for r in rows if r[0] < 10],
        [r for r in rows if r[0] >= 10],
        2,
    )
    gm: dict[int, list] = {}
    for r in got:
        gm.setdefault(r["a_id"], []).append((r["b_id"], r["cos_e6"]))
    assert gm == exp
    # exclude_self=False lets identity pairs through (cos 1e6)
    keep = knn_join(a, a, k=1, method="exact",
                    exclude_self=False).collect()
    assert all(r["b_id"] == r["a_id"] and r["cos_e6"] == 1_000_000
               for r in keep)
    with pytest.raises(ValueError):
        knn_join(a, b, k=0)
    with pytest.raises(ValueError):
        knn_join(a, b, method="hnsw")


def test_semdedup(spark):
    import numpy as np

    from sparkfts.ops.knnjoin import semdedup

    rng = np.random.Generator(np.random.PCG64(31))
    base = rng.normal(size=(10, 12))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # near-identical copies of vectors 0 and 1 (tiny perturbation)
    for j, src in ((100, 0), (101, 0), (102, 1)):
        pert = base[src] + rng.normal(scale=1e-4, size=12)
        rows.append((j, [float(x) for x in pert]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: (r["cluster_id"], r["is_canonical"])
           for r in semdedup(df, threshold_e6=999_000,
                             n_planes=2).collect()}
    assert set(got) == {r[0] for r in rows}  # every id exactly once
    # copies of 0 cluster under min id 0; only 0 is canonical there
    assert got[0] == (0, True)
    assert got[100] == (0, False) and got[101] == (0, False)
    assert got[102] == (1, False) and got[1] == (1, True)
    # unrelated vectors are canonical singletons
    for i in range(2, 10):
        assert got[i] == (i, True), i
    kept = [v for v, (_c, can) in got.items() if can]
    assert sorted(kept) == list(range(10))
