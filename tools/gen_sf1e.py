#!/usr/bin/env python3
"""Regenerate the 10x decade corpus (/tmp/sf1e) from sf0.1 — the
documented round-14/15 recipe, now executable instead of prose:

  - documents: 10 copies, doc_id + i*5000 (m-safe contiguous renumber —
    the m-family twin convention needs doc_id < 100000), 'c{i} ' text
    prefix on copies i>0 so copies are near- not exact-dups
  - embeddings: 10 copies, vec_id + i*2000, first component +0.001*i
  - orders / lineitem / events: 10 copies, order/event keys + i*1e7
    (FKs to the single-copy dims unchanged; lineitem follows orders)
  - dims (customer, part, supplier, nation, region): single copy

Usage: python3 tools/gen_sf1e.py [src=/root/testdata/sf0.1] [dst=/tmp/sf1e]
"""
import sys, os
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1e"
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 16")

def copy10(table, select_i):
    parts = " UNION ALL ".join(select_i(i) for i in range(10))
    con.execute(f"COPY ({parts}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

copy10("documents", lambda i:
    f"""SELECT doc_id + {i*5000} AS doc_id,
        {"text" if i == 0 else f"'c{i} ' || text"} AS text,
        lang, source, n_chars FROM '{src}/documents.parquet'""")

copy10("embeddings", lambda i:
    f"""SELECT vec_id + {i*2000} AS vec_id,
        list_prepend(CAST(embedding[1] + {0.001*i} AS FLOAT),
          embedding[2:]) AS embedding,
        label FROM '{src}/embeddings.parquet'""")

copy10("orders", lambda i:
    f"""SELECT o_orderkey + {i*10**7} AS o_orderkey, o_custkey,
        o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet'""")

copy10("lineitem", lambda i:
    f"""SELECT l_orderkey + {i*10**7} AS l_orderkey, l_partkey, l_suppkey,
        l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
        l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet'""")

copy10("events", lambda i:
    f"""SELECT event_id + {i*10**7} AS event_id, ts, user_id, event_type,
        value, props FROM '{src}/events.parquet'""")

for t in ["customer", "part", "supplier", "nation", "region"]:
    con.execute(
        f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: single copy")
print("done:", dst)
