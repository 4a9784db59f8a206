#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01 \
           [prior_CORRECTNESS.json]
Reads each <out>/<name> parquet (Spark result) + <out>/oracle_sql.json,
runs the oracle in DuckDB over the sf tables, and compares values
(columns sorted by name; rows compared both as-emitted and sorted).

Omission guards (the round-8 incident: 10 queries errored at runtime,
left no output, and the record shrank while staying "all green"):
- every oracle_sql.json name with no Spark output dir is a FAIL;
- with a prior CORRECTNESS_r*.json third arg, any query present in the
  prior round but absent from this output set is a FAIL (superset rule).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

out_dir, sf_dir = sys.argv[1], sys.argv[2]
prior_json = sys.argv[3] if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written table: directory of part files
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def first_nonnull(v):
    for x in v:
        if not (np.isscalar(x) and pd.isna(x)) and x is not None:
            return x
    return None

def type_class(series):
    """Rendering class as the driver's hash sees it: DuckDB HUGEINT /
    DECIMAL(38,0) arrive as float64 and render '819446.0', Spark BIGINT
    renders '819446' — a class mismatch even at equal values. Bit width
    within a kind (int32 vs int64) renders identically, so compare the
    KIND, plus the Python type of the first non-null for object cols."""
    k = series.dtype.kind  # i/u=int f=float b=bool M=ts O=object
    if k in "iu":
        return "int"
    if k == "O":
        x = first_nonnull(series.values)
        return "null" if x is None else f"obj:{type(x).__name__}"
    return {"f": "float", "b": "bool", "M": "ts"}.get(k, str(series.dtype))

def dtypes_equal(a, b):
    """Strict type-class compare — the driver's hash is TYPE-sensitive;
    6 value-identical queries shipped red in r11 because this replica
    compared values only (Decimal(5)==5 → True)."""
    for c in a.columns:
        ta, tb = type_class(a[c]), type_class(b[c])
        if ta != tb and "null" not in (ta, tb):
            return False, f"col {c} type class: spark={ta} vs duckdb={tb}"
    return True, ""

# Oracle terminal-type lint (the r11 red class): DuckDB SUM(BIGINT) →
# HUGEINT and SUM(DECIMAL(38,0)) stays DECIMAL(38,0); the driver's hash
# renders those differently from Spark's BIGINT even at equal values.
# The repo convention is terminal CAST(... AS BIGINT) — flag any oracle
# whose DESCRIBE output still emits a huge type.
BANNED_TERMINALS = ("HUGEINT", "UHUGEINT", "DECIMAL(38,0)")
def lint_terminal_types(name, sql):
    try:
        desc = con.execute(f"DESCRIBE {sql}").df()
    except Exception as e:
        return [f"describe error: {e}"]
    bad = []
    for _, r in desc.iterrows():
        t = str(r["column_type"]).upper().replace(" ", "")
        if any(b in t for b in BANNED_TERMINALS):
            bad.append(f"{r['column_name']}: {r['column_type']}")
    return bad

def values_equal(a, b):
    if a.shape != b.shape:
        return False, f"shape {a.shape} vs {b.shape}"
    ok, why = dtypes_equal(a, b)
    if not ok:
        return False, why
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        for i in range(len(av)):
            x, y = av[i], bv[i]
            if isinstance(x, (list, np.ndarray)) or isinstance(y, (list, np.ndarray)):
                xa = np.asarray(x, dtype=float); ya = np.asarray(y, dtype=float)
                if xa.shape != ya.shape or not np.array_equal(xa, ya):
                    return False, f"col {c} row {i}: {x} vs {y}"
            else:
                if pd.isna(x) and pd.isna(y):
                    continue
                if isinstance(x, float) or isinstance(y, float):
                    if x != y:
                        return False, f"col {c} row {i}: {x!r} vs {y!r}"
                elif x != y:
                    return False, f"col {c} row {i}: {x!r} vs {y!r}"
    return True, ""

names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/q*") if os.path.isdir(p))
n_ok = n_fail = n_noracle = 0
errs, was_full = {}, None
err_path = f"{out_dir}/verify_errors.json"
if os.path.exists(err_path):
    manifest = json.load(open(err_path))
    errs, was_full = manifest["failed"], manifest["full"]
# omission guard: on a FULL Verify run, every oracle name must have
# either an output dir or a recorded failure. Legacy out dirs (no
# manifest) fall back to a size heuristic that can't catch partial
# omission — re-run Verify to get the manifest.
full = was_full if was_full is not None else len(names) >= len(oracle)
if full:
    for name in sorted(set(oracle) - set(names) - set(errs)):
        print(f"FAIL  {name}: oracle present but no spark output (silent omission)")
        n_fail += 1
for name, msg in sorted(errs.items()):
    print(f"FAIL  {name}: query errored: {msg[:200]}")
    n_fail += 1
if prior_json:
    prior = set(json.load(open(prior_json)))
    for name in sorted(prior - set(names)):
        print(f"FAIL  {name}: in prior round's record but missing here (superset rule)")
        n_fail += 1
for name in names:
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL  {name}: no spark output"); n_fail += 1; continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    if name not in oracle:
        print(f"ROWS  {name}: rows={len(spark_df)} (no oracle)"); n_noracle += 1
        continue
    bad_types = lint_terminal_types(name, oracle[name])
    if bad_types:
        print(f"FAIL  {name}: oracle terminal-type lint: {bad_types}")
        n_fail += 1
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL  {name}: duckdb error: {e}"); n_fail += 1; continue
    a, b = canon(spark_df), canon(duck_df)
    ok, why = values_equal(a, b)
    if ok:
        print(f"OK    {name}: rows={len(a)}"); n_ok += 1
    else:
        print(f"FAIL  {name}: {why}"); n_fail += 1
print(f"\n{n_ok} ok, {n_fail} fail, {n_noracle} rows-only")
sys.exit(1 if n_fail else 0)
