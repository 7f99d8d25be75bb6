"""Simulate the driver's correctness gate: run each __spark_entry__ query on
Spark AND its oracle_sql on DuckDB over the same sf_dir, compare row-count,
column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == 0:
                    v = 0.0  # -0.0 stringifies as '-0.0' — a spurious FAIL
                if math.isnan(v):
                    v = "NaN"
            vals.append(str(v) if v is not None else "<NULL>")
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from lyra_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8, app_name="oracle_check")

    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except Exception as e:
            # a partial fixture dir shouldn't abort checks that never touch
            # the missing table; queries that DO will fail loudly themselves
            print(f"[check_oracle] WARNING: no view for {t}: {e}")

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in osql:
            print(f"{name:24s} rows-only ({len(srows)} rows, no oracle)")
            continue
        ores = con.sql(osql[name])
        orows = ores.fetchall()
        ocols = list(ores.columns)
        status = []
        if len(srows) != len(orows):
            status.append(f"ROWCOUNT {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            status.append(f"SCHEMA {sorted(scols)} vs {sorted(ocols)}")
        if not status:
            a = normalize([tuple(r) for r in srows], scols)
            b = normalize(orows, ocols)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                status.append(f"VALUES differ, e.g. {diff}")
        if status:
            failures.append(name)
            print(f"{name:24s} FAIL: {'; '.join(status)}")
        else:
            print(f"{name:24s} OK ({len(srows)} rows)")
    print("\nRESULT:", "FAIL " + ",".join(failures) if failures else "ALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
