#!/bin/bash
# Interleaved A/B for spark.graft.bloomSizeByEstimate at sf30 (the r13/r14
# verdict ask): q3_shipping's ~9M-key carrier saturates the fixed filter
# per BASELINE r11. Arms alternate OFF/ON within each rep so epoch drift
# hits both equally; one fresh JVM per query (bench_isolated.sh protocol).
# The ON arm raises maxNumItems alongside the flag — BloomFilterAggregate
# silently caps numItems at that conf, and the whole point of the flag is
# sizing past the 4M default (see ChainBloomInjection.sizedParams).
set -eu
cd /root/repo
REPS=${REPS:-3}
SF=localdata/sf30
Q="q3_shipping q5_region_revenue"
OUT=${OUT:-/tmp/ab_bloom_sf30}
mkdir -p "$OUT"
for r in $(seq 1 "$REPS"); do
  echo "=== rep $r OFF ===" >&2
  scripts/bench_isolated.sh "$SF" "$OUT/off_$r.json" $Q
  echo "=== rep $r ON ===" >&2
  SPARK_GRAFT_EXTRA_CONF="spark.graft.bloomSizeByEstimate=true;spark.sql.optimizer.runtime.bloomFilter.maxNumItems=16000000" \
    scripts/bench_isolated.sh "$SF" "$OUT/on_$r.json" $Q
done
python3 - "$OUT" "$REPS" <<'EOF'
import json, sys
out, reps = sys.argv[1], int(sys.argv[2])
for arm in ("off", "on"):
    for q in ("q3_shipping", "q5_region_revenue"):
        vals = []
        for r in range(1, reps + 1):
            d = json.load(open(f"{out}/{arm}_{r}.json"))
            vals.append(d["queries"][q])
        print(arm, q, [round(v, 2) for v in vals], "median", sorted(vals)[len(vals)//2])
EOF
