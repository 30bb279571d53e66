"""ES runtime fields: Catalyst script backend vs the numpy backend."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sparkfts.scripting import (
    compile_script,
    compile_script_column,
    runtime_field,
)


SCRIPTS = [
    "_score * (0.5 + value / (value + 10))",
    "log1p(value) - sqrt(_score)",
    "max(min(_score, value), 2) + pow(value, 0.5)",
    "-_score / 3 + exp(0 - value / 100)",
]


@pytest.mark.parametrize("src", SCRIPTS)
def test_column_backend_matches_numpy(spark, src):
    rng = np.random.RandomState(7)
    score = rng.uniform(0.1, 9.0, 64)
    value = rng.randint(1, 500, 64).astype(np.float64)
    exp = compile_script(src)({"_score": score, "value": value})

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame({"i": np.arange(64), "_score": score, "value": value})
    )
    got = (
        df.withColumn(
            "out",
            compile_script_column(
                src, {"_score": F.col("_score"), "value": F.col("value")}
            ),
        )
        .orderBy("i")
        .select("out")
        .toPandas()["out"]
        .to_numpy()
    )
    # arithmetic/sqrt/min/max are bit-identical; log1p/exp/pow are libm
    # transcendentals that may differ in the last ulp across backends
    np.testing.assert_allclose(got, exp, rtol=3e-15, atol=0)


def test_runtime_field_filter_sort_agg(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(20), "n": [i * 3 + 1 for i in range(20)]})
    )
    rt = runtime_field(df, "rt", "log1p(n) * 2")
    rows = rt.where("rt > 5").orderBy("id").collect()
    exp_ids = [i for i in range(20) if np.log1p(i * 3 + 1) * 2 > 5]
    assert [r["id"] for r in rows] == exp_ids
    top = rt.orderBy(rt["rt"].desc(), "id").limit(3).collect()
    assert [r["id"] for r in top] == [19, 18, 17]
    from pyspark.sql import functions as F

    agg = rt.agg(F.max("rt")).collect()[0][0]
    assert agg == pytest.approx(np.log1p(58) * 2, rel=1e-15)


def test_runtime_field_fail_loud(spark):
    df = spark.createDataFrame(pd.DataFrame({"id": [1], "n": [2]}))
    with pytest.raises(ValueError, match="unknown script name"):
        runtime_field(df, "rt", "missing + 1")
    with pytest.raises(ValueError, match="unknown script name"):
        # restricting fields hides the column
        runtime_field(df, "rt", "n + 1", fields=["id"])
    with pytest.raises(ValueError):
        runtime_field(df, "rt", "n +")


def test_runtime_field_stays_jvm_side(spark):
    """No Python evaluation node may appear in the plan."""
    df = spark.createDataFrame(pd.DataFrame({"id": [1, 2], "n": [3, 4]}))
    rt = runtime_field(df, "rt", "sqrt(n) + id")
    plan = rt._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
