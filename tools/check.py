#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle against DuckDB views over the
sfDir parquet tables, and compares columns sorted by name, rows sorted,
values as SERIALIZED STRINGS — with the Spark side read via
pyarrow.to_pandas() and the oracle side via duckdb .df().

The asymmetric read paths + string compare emulate a hashing driver:
duckdb's pandas path converts DECIMAL(38,2) to float64 ('222017.00' ->
'222017.0') while pyarrow keeps Decimal objects — numerically equal,
hash-unequal. Round 2 lost 8 queries to exactly that. The rule this
enforces: NO DECIMAL-TYPED OUTPUT COLUMNS (aggregate in decimal, final-
cast to DOUBLE). Don't weaken this back to Python `==`.
"""
import glob, json, sys
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(x):
    if x is None:
        return "NULL"
    try:
        if pd.isna(x):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(x)

def norm(df):
    cols = sorted(df.columns)
    rows = [tuple(canon(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            mcols, mrows = norm(pq.read_table(files).to_pandas())
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            rcols, rrows = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if mcols != rcols:
            print(f"FAIL {name}: columns {mcols} vs oracle {rcols}")
            n_fail += 1
            continue
        if len(mrows) != len(rrows):
            print(f"FAIL {name}: {len(mrows)} rows vs oracle {len(rrows)}")
            print("  mine:", mrows[:3], "\n  ref: ", rrows[:3])
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(mrows, rrows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(mrows)} mismatched rows; first:")
            for a, b in bad[:3]:
                print("  mine:", a, "\n  ref: ", b)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mrows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
