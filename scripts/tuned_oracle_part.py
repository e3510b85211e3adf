#!/usr/bin/env python3
"""Partial tuned-oracle pass: compares an explicit query list and appends
one JSON line per query — lets a long sf1 pass be split across processes
and merged (see tuned_oracle.py for the single-shot variant).

Usage: tuned_oracle_part.py <sf_dir> <verify_out_dir> <out.jsonl> <q1,q2,...>
"""
import duckdb, json, sys, time

sf, outdir, dest = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4].split(',')
con = duckdb.connect()
con.execute("SET memory_limit='40GB'")
con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
con.execute("SET threads=8")
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def canon(rel):
    df = rel.df()
    df = df[sorted(df.columns)]
    return sorted([tuple(str(x) for x in r) for r in df.itertuples(index=False)])

out = open(dest, 'a')
for name in names:
    sql = oracle[name].replace('__GRAFT_OUT__', outdir)
    t0 = time.time()
    try:
        ours = canon(con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"))
        theirs = canon(con.sql(sql))
        rec = {"name": name, "rows": len(ours), "match": ours == theirs}
    except Exception as e:
        rec = {"name": name, "match": False, "err": str(e)[:200]}
    out.write(json.dumps(rec) + "\n")
    out.flush()
    print(f"{name} {'OK' if rec.get('match') else 'BAD'} {time.time()-t0:.1f}s",
          file=sys.stderr)
