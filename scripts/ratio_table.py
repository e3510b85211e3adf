#!/usr/bin/env python3
"""Merge a graft Bench JSON line with a DuckDB-proxy JSON into the
per-query ratio table BASELINE.md records (measurement tooling).

Usage: ratio_table.py <bench.json> <proxy.json>
"""
import json, sys

bench = json.load(open(sys.argv[1]))
proxy = json.load(open(sys.argv[2]))
pq = proxy["queries"]
rows = []
for name, gsec in sorted(bench["queries"].items()):
    if name not in pq or pq[name]["sec"] <= 0:
        continue
    dsec = pq[name]["sec"]
    rows.append((name, gsec, dsec, gsec / dsec if dsec > 0 else float("inf")))

print("| query | graft local[4] (s) | duckdb 4t (s) | ratio |")
print("|---|---|---|---|")
for name, g, d, r in rows:
    print(f"| {name} | {g:.2f} | {d:.3f} | {r:.1f}x |")
gt = sum(r[1] for r in rows)
dt = sum(r[2] for r in rows)
med = sorted(r[3] for r in rows)[len(rows) // 2]
print(f"| **total ({len(rows)} comparable)** | **{gt:.1f}** | **{dt:.1f}** | "
      f"**{gt/dt:.1f}x (median {med:.1f}x)** |")
n2 = sum(1 for r in rows if r[3] <= 2.0)
n5 = sum(1 for r in rows if r[3] <= 5.0)
print(f"\nwithin 2x: {n2}/{len(rows)}; within 5x: {n5}/{len(rows)}")
