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
        srows = [tuple(r) for r in sdf.collect()]
        status = "rows-only"
        if name in sqls:
            res = con.execute(sqls[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok_cols = sorted(scols) == sorted(dcols)
            # align column order by name before comparing values
            if ok_cols:
                sidx = [scols.index(c) for c in sorted(scols)]
                didx = [dcols.index(c) for c in sorted(dcols)]
                a = norm_rows([[r[i] for i in sidx] for r in srows])
                b = norm_rows([[r[i] for i in didx] for r in drows])
                ok_vals = a == b
            else:
                ok_vals = False
            status = "MATCH" if (ok_cols and ok_vals) else "MISMATCH"
            if status == "MISMATCH":
                failures.append(name)
                print(f"  spark cols={scols} rows={len(srows)}")
                print(f"  duck  cols={dcols} rows={len(drows)}")
                if ok_cols:
                    sa = set(a) - set(b)
                    sb = set(b) - set(a)
                    for x in list(sa)[:3]:
                        print(f"    spark-only: {x}")
                    for x in list(sb)[:3]:
                        print(f"    duck-only:  {x}")
        print(
            f"{name:24s} {status:9s} rows={len(srows):6d} "
            f"({time.time() - t0:.1f}s)"
        )
    print(f"\n{'FAILURES: ' + ', '.join(failures) if failures else 'ALL OK'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
