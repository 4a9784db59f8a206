#!/usr/bin/env python3
"""Pairwise multiset compare of two Verify output directories.

Usage: python3 tools/compare_runs.py /tmp/runA /tmp/runB
For every query present in either run: both outputs must exist, share a
schema, and be multiset-identical (DuckDB EXCEPT ALL both directions).
This is the invariance audit's comparator — stronger than the oracle
gate alone because it catches partitioning/task-order-dependent values
even where both runs happen to satisfy a sorted oracle compare.
"""
import sys, os, glob
import duckdb

a_dir, b_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()

names = sorted({os.path.basename(p)
                for p in glob.glob(f"{a_dir}/*") + glob.glob(f"{b_dir}/*")
                if os.path.isdir(p)})
bad = 0
for name in names:
    pa, pb = f"{a_dir}/{name}/*.parquet", f"{b_dir}/{name}/*.parquet"
    if not glob.glob(pa) or not glob.glob(pb):
        print(f"FAIL  {name}: missing in one run"); bad += 1; continue
    try:
        ca = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{pa}')").fetchall()]
        cb = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{pb}')").fetchall()]
        if sorted(ca) != sorted(cb):
            print(f"FAIL  {name}: schema {ca} vs {cb}"); bad += 1; continue
        cols = ", ".join(f'"{c}"' for c in sorted(ca))
        d1 = con.execute(
            f"SELECT COUNT(*) FROM (SELECT {cols} FROM read_parquet('{pa}')"
            f" EXCEPT ALL SELECT {cols} FROM read_parquet('{pb}'))"
        ).fetchone()[0]
        d2 = con.execute(
            f"SELECT COUNT(*) FROM (SELECT {cols} FROM read_parquet('{pb}')"
            f" EXCEPT ALL SELECT {cols} FROM read_parquet('{pa}'))"
        ).fetchone()[0]
        if d1 or d2:
            print(f"FAIL  {name}: {d1}+{d2} differing rows"); bad += 1
        else:
            print(f"OK    {name}")
    except Exception as e:
        print(f"FAIL  {name}: {e}"); bad += 1

print(f"\n{len(names) - bad} identical, {bad} differ")
sys.exit(1 if bad else 0)
