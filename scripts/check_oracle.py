#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin on the
same scale factor, compare row count, schema (column names), and
order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from wrangle_pypes_spark.session import get_session
from wrangle_pypes_spark.sources import TABLES


def canon(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return round(val, 9)
    if isinstance(val, (list, tuple)):
        return tuple(canon(v) for v in val)
    return val


def df_to_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    canoned = [tuple(canon(r[i]) for i in idx) for r in rows]
    # sort by repr so None/mixed types compare consistently on both sides
    return sorted(canoned, key=lambda row: tuple(repr(v) for v in row)), \
        [cols[i] for i in idx]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_session("oracle-check", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{os.path.join(sf_dir, t + '.parquet')}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        s_sorted, s_cols = df_to_rows(scols, [tuple(r) for r in srows])
        d_sorted, d_cols = df_to_rows(dcols, drows)
        if s_cols != d_cols:
            failures.append(name)
            print(f"FAIL {name}: schema mismatch spark={s_cols} duck={d_cols}")
            continue
        if len(s_sorted) != len(d_sorted):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(s_sorted)} duck={len(d_sorted)}")
            continue
        if s_sorted != d_sorted:
            failures.append(name)
            bad = next(i for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:")
            print(f"  spark: {s_sorted[bad]}")
            print(f"  duck : {d_sorted[bad]}")
            continue
        print(f"PASS {name} ({len(s_sorted)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
