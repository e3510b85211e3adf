#!/usr/bin/env python3
"""DuckDB proxy benchmark (measurement tooling — NOT part of the graft
library): times SparkEntry.oracleSql queries over the same parquet dir the
graft Bench ran on, 4 threads, one warmup pass + one timed pass — the same
protocol as graft.Bench at SPARK_GRAFT_CPUS=4.

The real reference (DuckDB-Iceberg) cannot run offline, so this floor has
NO Iceberg metadata planning and no simulated object-store latency; see
BASELINE.md for how the numbers are interpreted.

Usage: bench_duckdb_proxy.py <sf_dir> <oracle_sql.json> [out.json]
Only queries whose oracle SQL is the natural equivalent workload are timed
(relational/TPC-H/text/events shapes); SELECT-* passthroughs and
quadratic oracle checks (written to VERIFY hash-based ops, not to compute
them efficiently) are excluded.
"""
import duckdb, json, sys, time

SKIP = {
    # SELECT-* passthrough oracles: graft materializes an Iceberg scan,
    # DuckDB would just copy parquet — not a comparable query.
    "ice_time_travel", "ice_sorted_write", "ice_delete_mor", "ice_update_mor",
    "ice_merge_into", "ice_rewrite_compact", "ice_dv_delete", "ice_eq_delete",
    "ice_schema_evolution", "stream_incremental", "stream_microbatch",
    "sql_time_travel",
    # quadratic verification oracles for sub-quadratic graft operators
    "dedup_minhash", "dedup_simhash", "dedup_embedding", "dedup_clusters",
    # oracles that read the verify run's own __GRAFT_OUT__ dumps or fixed
    # VALUES literals — verification plumbing, not a comparable workload
    "meta_snapshots", "meta_manifest_entries", "meta_column_stats",
    "ice_nested_evolution",
}

def main():
    sf, oracle_path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else None
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    con = duckdb.connect()
    con.execute("SET threads=4")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    results = {}
    for name in sorted(oracle):
        if name in SKIP or (only is not None and name not in only):
            continue
        sql = oracle[name]
        try:
            con.sql(sql).fetchall()          # warmup (plan + page cache)
            t0 = time.time()
            rows = con.sql(sql).fetchall()   # timed
            results[name] = {"sec": round(time.time() - t0, 4), "rows": len(rows)}
        except Exception as e:
            results[name] = {"sec": -1, "err": str(e)[:200]}
    total = sum(r["sec"] for r in results.values() if r["sec"] > 0)
    doc = {"metric": "duckdb_proxy_total", "value": round(total, 3), "unit": "sec",
           "threads": 4, "sf": sf, "queries": results}
    print(json.dumps(doc))
    if out:
        json.dump(doc, open(out, "w"), indent=1)

if __name__ == "__main__":
    main()
