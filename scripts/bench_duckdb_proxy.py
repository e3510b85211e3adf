#!/usr/bin/env python3
"""DuckDB proxy benchmark (measurement tooling — NOT part of the graft
library): times SparkEntry.oracleSql queries over the same parquet dir the
graft Bench ran on, 4 threads, one warmup pass + one timed pass — the same
protocol as graft.Bench at SPARK_GRAFT_CPUS=4.

The real reference (DuckDB-Iceberg) cannot run offline, so this floor has
NO Iceberg metadata planning and no simulated object-store latency; see
BASELINE.md for how the numbers are interpreted.

Usage: bench_duckdb_proxy.py <sf_dir> <oracle_sql.json> [out.json] [only] [--fs-delay-ms=N]
Only queries whose oracle SQL is the natural equivalent workload are timed
(relational/TPC-H/text/events shapes); SELECT-* passthroughs and
quadratic oracle checks (written to VERIFY hash-based ops, not to compute
them efficiently) are excluded.

--fs-delay-ms=N charges a fixed N ms per *.parquet open and per pread/read
call (an LD_PRELOAD shim compiled from fs_delay_shim.c; the script re-execs
itself with it loaded) + disables DuckDB's external file cache — the proxy
half of the reference benchmark's `debug_fs_delay_mean_ms=3` +
`enable_external_file_cache=false` regime (graft's half:
graft.sources.DelaySimFileSystem via SPARK_GRAFT_FS_DELAY_MS).
"""
import duckdb, json, os, subprocess, sys, time


def reexec_with_shim(delay_ms):
    """Compile the pread-delay shim (once) and re-exec under LD_PRELOAD."""
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "fs_delay_shim.c")
    so = "/tmp/graft_fs_delay_shim.so"
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.check_call(
            ["gcc", "-shared", "-fPIC", "-O2", "-o", so, src, "-ldl"])
    env = dict(os.environ)
    env["LD_PRELOAD"] = so
    env["GRAFT_FS_DELAY_MS"] = str(delay_ms)
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

SKIP = {
    # SELECT-* passthrough oracles: graft materializes an Iceberg scan,
    # DuckDB would just copy parquet — not a comparable query.
    "ice_time_travel", "ice_sorted_write", "ice_delete_mor", "ice_update_mor",
    "ice_merge_into", "ice_rewrite_compact", "ice_dv_delete", "ice_eq_delete",
    "ice_schema_evolution", "stream_incremental", "stream_microbatch",
    "stream_dedup",
    "sql_time_travel",
    # quadratic verification oracles for sub-quadratic graft operators
    "dedup_minhash", "dedup_simhash", "dedup_embedding", "dedup_clusters",
    # oracles that read the verify run's own __GRAFT_OUT__ dumps or fixed
    # VALUES literals — verification plumbing, not a comparable workload
    "meta_snapshots", "meta_manifest_entries", "meta_column_stats",
    "ice_nested_evolution",
}

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--fs-delay-ms=")]
    delay_ms = next((int(a.split("=", 1)[1]) for a in sys.argv[1:]
                     if a.startswith("--fs-delay-ms=")), 0)
    sf, oracle_path = args[0], args[1]
    out = args[2] if len(args) > 2 else None
    only = set(args[3].split(",")) if len(args) > 3 else None
    if delay_ms > 0 and os.environ.get("GRAFT_FS_DELAY_MS") != str(delay_ms):
        reexec_with_shim(delay_ms)
    con = duckdb.connect()
    con.execute("SET threads=4")
    if delay_ms > 0:
        try:
            con.execute("SET enable_external_file_cache=false")
        except Exception:
            pass  # older duckdb: no external file cache to disable
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
