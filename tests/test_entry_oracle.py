"""Driver-contract regression: every queries() entry vs its DuckDB oracle.

Mirrors the driver's CORRECTNESS check (row count + column names +
order-insensitive stringified values) at sf0.001 for speed; the driver
itself runs sf0.01 (verified green via tools/check_oracle.py).
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_oracle import TABLES, norm_rows

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


ALL = sorted(entrymod.queries())


@pytest.mark.parametrize("name", ALL)
def test_entry_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sqls = entrymod.oracle_sql()
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in sqls:
        assert len(srows) >= 0  # rows-only contract
        return
    res = duck.execute(sqls[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    sidx = [sdf.columns.index(c) for c in sorted(sdf.columns)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    assert norm_rows([[r[i] for i in sidx] for r in srows]) == norm_rows(
        [[r[i] for i in didx] for r in drows]
    ), f"{name}: value mismatch"


def test_entry_flagship(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert df.columns == ["rank", "doc_id", "score"]
    assert len(rows) == 10
    assert [r["rank"] for r in rows] == list(range(1, 11))
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
