#!/usr/bin/env python3
"""Tuned-engine oracle pass (measurement tooling, driver-side python).

Compares a SPARK_GRAFT_TUNED=1 graft.Verify dump against the DuckDB oracle
with the driver's canonicalization (sort columns by name, stringify, sort
rows) and emits one JSON block for CORRECTNESS_tuned_r{N}.json.

Usage: tuned_oracle.py <sf_dir> <verify_out_dir> <block.json> [excluded...]
Excluded queries record their Spark row count with oracle="excluded"
(e.g. dedup_clusters at sf1: the quadratic transitive-closure oracle
spills >25 GB in DuckDB; covered instead by ClusterScaleSpec).
"""
import duckdb, json, sys, time

sf, outdir, dest = sys.argv[1], sys.argv[2], sys.argv[3]
excluded = set(sys.argv[4:])
con = duckdb.connect()
# Bound the oracle's memory and let heavy verification SQL (the quadratic
# dedup oracles at sf1) spill instead of climbing toward the host limit.
con.execute("SET memory_limit='40GB'")
con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def canon(rel):
    df = rel.df()
    df = df[sorted(df.columns)]
    return sorted([tuple(str(x) for x in r) for r in df.itertuples(index=False)])

queries, ok, bad = {}, 0, 0
for name, sql in sorted(oracle.items()):
    sql = sql.replace('__GRAFT_OUT__', outdir)
    spark_rel = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
    if name in excluded:
        queries[name] = {"rows": len(spark_rel.df()), "oracle": "excluded"}
        continue
    t0 = time.time()
    try:
        ours = canon(spark_rel)
        theirs = canon(con.sql(sql))
        m = ours == theirs
        queries[name] = {"rows": len(ours), "match": m}
        if m: ok += 1
        else:
            bad += 1
            print(f"BAD {name} spark={len(ours)} oracle={len(theirs)}", file=sys.stderr)
    except Exception as e:
        bad += 1
        queries[name] = {"match": False, "err": str(e)[:200]}
        print(f"ERR {name} {e}", file=sys.stderr)
    print(f"{name} {'OK' if queries[name].get('match') else 'BAD'} "
          f"{time.time()-t0:.1f}s", file=sys.stderr)

block = {"ok": ok, "bad": bad, "excluded": sorted(excluded & set(oracle)),
         "queries": queries}
json.dump(block, open(dest, 'w'), indent=1)
print(f"{ok} OK / {bad} BAD / {len(block['excluded'])} excluded -> {dest}")
