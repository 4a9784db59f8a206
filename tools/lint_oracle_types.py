#!/usr/bin/env python3
"""Oracle terminal-type lint (the r11 red class, as a standalone gate).

DuckDB's SUM(BIGINT) returns HUGEINT and SUM(DECIMAL(38,0)) stays
DECIMAL(38,0); the driver's correctness hash is TYPE-sensitive — it
renders those through a float/typed form ("819446.0") that never equals
Spark's BIGINT rendering ("819446") even when values match. Six
value-identical queries shipped hash-red in round 11 because of it.
The repo convention is a terminal CAST(... AS BIGINT); this lint
DESCRIBEs every oracle SQL and fails on any HUGEINT / UHUGEINT /
DECIMAL(38,0) output column, so the class cannot ship again.

Usage:
  python3 tools/lint_oracle_types.py <oracle_sql.json> <sf_dir>
  python3 tools/lint_oracle_types.py --self-test <sf_dir>

Exit 0 = clean; exit 1 = offenders (printed one per line).
Called by OracleLintSpec (assume-guarded: cancels where python3/duckdb
is absent) and by tools/check_oracle.py's in-process twin.
"""
import sys, os, json
import duckdb

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL(38,0)")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def lint(con, name, sql):
    try:
        desc = con.execute(f"DESCRIBE {sql}").df()
    except Exception as e:
        return [f"{name}: describe error: {e}"]
    out = []
    for _, r in desc.iterrows():
        t = str(r["column_type"]).upper().replace(" ", "")
        if any(b in t for b in BANNED):
            out.append(f"{name}: column {r['column_name']} has terminal "
                       f"type {r['column_type']} — add CAST(... AS BIGINT) "
                       "(repo convention; the driver hash renders this "
                       "differently from Spark even at equal values)")
    return out


def self_test(sf_dir):
    """The lint rule regression-tests itself: a deliberately HUGEINT- and
    DECIMAL(38,0)-emitting fixture must be flagged; its cast twin must
    pass. Deleting the rule makes this exit non-zero."""
    con = connect(sf_dir)
    bad_fix = {
        "fixture_hugeint": "SELECT SUM(o_custkey) AS s FROM orders",
        "fixture_dec380":
            "SELECT CAST(SUM(o_custkey) AS DECIMAL(38,0)) AS s FROM orders",
    }
    good_fix = {
        "fixture_cast":
            "SELECT CAST(SUM(o_custkey) AS BIGINT) AS s FROM orders",
    }
    fails = []
    for n, q in bad_fix.items():
        if not lint(con, n, q):
            fails.append(f"self-test: {n} should be flagged but was not")
    for n, q in good_fix.items():
        got = lint(con, n, q)
        if got:
            fails.append(f"self-test: {n} should pass but got {got}")
    for f in fails:
        print(f)
    print("self-test: " + ("FAIL" if fails else "OK"))
    return 1 if fails else 0


def main():
    if sys.argv[1] == "--self-test":
        sys.exit(self_test(sys.argv[2]))
    oracle_json, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(oracle_json))
    con = connect(sf_dir)
    offenders = []
    for name, sql in sorted(oracle.items()):
        offenders.extend(lint(con, name, sql))
    for o in offenders:
        print(o)
    print(f"{len(oracle)} oracles linted, {len(offenders)} offender(s)")
    sys.exit(1 if offenders else 0)


if __name__ == "__main__":
    main()
