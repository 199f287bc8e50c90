#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle against DuckDB views over the
sfDir parquet tables, and compares: columns sorted by name, rows sorted,
values compared exactly (strings/ints) or bit-exactly (doubles).
"""
import json, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

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
            mine = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            mcols, mrows = norm(mine.fetchall(), mine.columns)
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            ref = con.sql(sql)
            rcols, rrows = norm(ref.fetchall(), ref.columns)
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
