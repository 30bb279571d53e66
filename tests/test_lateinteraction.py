"""ColBERT-style MaxSim vs a python mirror."""

from __future__ import annotations

import math

import numpy as np
import pytest

from sparkfts.ops.lateinteraction import maxsim_topk, split_token_vectors


def _q3(v):
    return [int(math.floor(x * 1000 + 0.5)) for x in v]


def _mirror(doc_vectors, qvecs, k):
    scored = []
    for vid, vecs in doc_vectors:
        total = 0
        for q in qvecs:
            qq = _q3(q)
            total += max(
                sum(a * b for a, b in zip(_q3(d), qq)) for d in vecs
            )
        scored.append((-total, vid))
    scored.sort()
    return [(vid, -neg) for neg, vid in scored[:k]]


@pytest.fixture(scope="module")
def multivec(spark):
    rng = np.random.Generator(np.random.PCG64(41))
    rows = [
        (i, [[float(x) for x in rng.normal(size=8)] for _ in range(4)])
        for i in range(25)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, vectors array<array<float>>"
    )
    return df, rows


def test_maxsim_matches_mirror(multivec):
    df, rows = multivec
    q = [rows[2][1][0], rows[5][1][3], [0.1] * 8]
    got = maxsim_topk(df, q, k=7).collect()
    exp = _mirror(rows, q, 7)
    assert [(r["vec_id"], r["maxsim"]) for r in got] == exp
    assert [r["rank"] for r in got] == list(range(1, 8))
    # single-query-token degeneration: maxsim == best single dot
    one = maxsim_topk(df, [q[0]], k=5).collect()
    exp1 = _mirror(rows, [q[0]], 5)
    assert [(r["vec_id"], r["maxsim"]) for r in one] == exp1


def test_split_token_vectors_roundtrip(spark):
    emb = spark.createDataFrame(
        [(0, [float(i) for i in range(16)])],
        "vec_id long, embedding array<float>",
    )
    row = split_token_vectors(emb, 4).collect()[0]
    assert [list(v) for v in row["vectors"]] == [
        [0.0, 1, 2, 3], [4.0, 5, 6, 7], [8.0, 9, 10, 11],
        [12.0, 13, 14, 15],
    ]
    with pytest.raises(ValueError):
        split_token_vectors(emb, 0)


def test_maxsim_validation(multivec):
    df, _ = multivec
    with pytest.raises(ValueError):
        maxsim_topk(df, [], k=3)
    with pytest.raises(ValueError):
        maxsim_topk(df, [[0.1] * 8], k=0)
    with pytest.raises(ValueError):
        maxsim_topk(df, [[0.1] * 8, [0.1] * 4], k=3)


def test_maxsim_plan_no_python(multivec, spark, tmp_path):
    import os

    df, _ = multivec
    p = os.path.join(str(tmp_path), "mv.parquet")
    df.write.parquet(p)
    out = maxsim_topk(spark.read.parquet(p), [[0.1] * 8], k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
