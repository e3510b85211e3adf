#!/usr/bin/env python3
"""Generate sfN test data as N*10 re-keyed copies of the driver's sf0.1
parquet (measurement tooling — NOT part of the graft library).

Same TPC-H-style scaling as gen_sf1.py (which this generalizes):
region/nation stay fixed; every other table gets COPIES re-keyed copies with
all join keys offset by a per-copy constant (1e8, far above any sf0.1 key),
so join cardinalities and selectivities scale linearly while date ranges
stay fixed — the same shape dbgen produces at higher SF.

Usage: gen_sfn.py <copies> <outdir>     e.g. gen_sfn.py 100 localdata/sf10
"""
import duckdb, os, sys

COPIES = int(sys.argv[1])
OUT = sys.argv[2]
SRC = "/root/testdata/sf0.1"
OFF = 100_000_000

con = duckdb.connect()
con.execute("SET threads=8")
con.execute("SET max_expression_depth TO 20000")
# Without this, COPY materializes the ENTIRE 1000-way UNION ALL in memory
# to preserve row order (~90 GB for sf100 lineitem before a byte hits
# disk); row order is irrelevant for bench data — stream instead.
con.execute("SET preserve_insertion_order=false")
os.makedirs(OUT, exist_ok=True)

for t in ["region", "nation"]:
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")

def gen(table, keycols):
    desc = con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()
    parts = []
    for i in range(COPIES):
        off = i * OFF
        cols = [f"({name} + {off})::{typ} AS {name}" if name in keycols and off else name
                for name, typ, *_ in desc]
        parts.append(f"SELECT {', '.join(cols)} FROM '{SRC}/{table}.parquet'")
    q = " UNION ALL ".join(parts)
    con.execute(f"COPY ({q}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 122880)")
    print(table, con.execute(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0], flush=True)

gen("customer",   {"c_custkey"})
gen("supplier",   {"s_suppkey"})
gen("part",       {"p_partkey"})
gen("orders",     {"o_orderkey", "o_custkey"})
gen("lineitem",   {"l_orderkey", "l_partkey", "l_suppkey"})
gen("events",     {"event_id", "user_id"})
gen("documents",  {"doc_id"})
gen("embeddings", {"vec_id"})
