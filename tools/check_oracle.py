"""Driver-simulation harness: run every queries() entry on Spark AND its
oracle_sql() on DuckDB over the same parquet tables, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_rows(rows) -> list[tuple]:
    out = []
    for r in rows:
        out.append(tuple(str(v) for v in r))
    return sorted(out)


def pandas_rows(df, cols) -> list[list]:
    """Render values the way the driver's hasher does: through pandas
    dtypes. DuckDB HUGEINT (int128) becomes float64 in pandas and renders
    as '6.0' while Spark BIGINT renders '6' — a mismatch str(int) hides.
    """
    sub = df[cols]
    return [list(row) for row in sub.itertuples(index=False, name=None)]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from sparkfts.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    spark = get_spark(cores=8, app_name="oracle-check")
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        spdf = sdf.toPandas()
        srows = len(spdf)
        status = "rows-only"
        if name in sqls:
            dpdf = con.execute(sqls[name]).df()
            dcols = list(dpdf.columns)
            drows = len(dpdf)
            ok_cols = sorted(scols) == sorted(dcols)
            # align column order by name before comparing values; render
            # through pandas dtypes exactly like the driver's hasher
            if ok_cols:
                a = norm_rows(pandas_rows(spdf, sorted(scols)))
                b = norm_rows(pandas_rows(dpdf, sorted(dcols)))
                ok_vals = a == b
            else:
                ok_vals = False
            status = "MATCH" if (ok_cols and ok_vals) else "MISMATCH"
            if status == "MISMATCH":
                failures.append(name)
                print(f"  spark cols={scols} rows={srows}")
                print(f"  duck  cols={dcols} rows={drows}")
                if ok_cols:
                    sa = set(a) - set(b)
                    sb = set(b) - set(a)
                    for x in list(sa)[:3]:
                        print(f"    spark-only: {x}")
                    for x in list(sb)[:3]:
                        print(f"    duck-only:  {x}")
        print(
            f"{name:24s} {status:9s} rows={srows:6d} "
            f"({time.time() - t0:.1f}s)"
        )
    print(f"\n{'FAILURES: ' + ', '.join(failures) if failures else 'ALL OK'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
