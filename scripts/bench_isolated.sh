#!/bin/bash
# Isolated-per-query bench (measurement tooling): one fresh JVM per query so
# no query's GC/cache residue pollutes another's wall clock — the same
# fresh-process protocol the reference's benchmark runner uses. Fixtures
# persist across JVMs via SPARK_GRAFT_FIXTURE_DIR (built on first use).
#
# Usage: bench_isolated.sh <sf_dir> <out.json> [query ...]
# With no query list, runs every SparkEntry query.
set -u
SF_DIR=$1; OUT=$2; shift 2
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_SF_DIR=$SF_DIR
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-4}
export SPARK_GRAFT_FIXTURE_DIR=${SPARK_GRAFT_FIXTURE_DIR:-/root/repo/localdata/fixtures}
mkdir -p "$SPARK_GRAFT_FIXTURE_DIR"

if [ $# -eq 0 ]; then
  QUERIES=$(java -cp "$CP" $OPENS -Dspark.ui.enabled=false graft.ListQueries 2>/dev/null)
else
  QUERIES="$*"
fi

: > "$OUT".jsonl
for q in $QUERIES; do
  line=$(SPARK_GRAFT_ONLY=$q java -cp "$CP" $OPENS -Xmx24g \
    -Dspark.ui.enabled=false graft.Bench 2>/dev/null | grep '"metric"')
  if [ -n "$line" ]; then echo "$line" >> "$OUT".jsonl; else echo "{\"queries\":{\"$q\":-1}}" >> "$OUT".jsonl; fi
  sec=$(echo "$line" | python3 -c "import json,sys;print(json.load(sys.stdin).get('queries',{}).get('$q',-1))" 2>/dev/null)
  echo "$q ${sec:--1}" >&2
done
python3 - "$OUT" <<'EOF'
import json, sys
qs, stats = {}, {}
for line in open(sys.argv[1] + ".jsonl"):
    d = json.loads(line)
    qs.update(d.get("queries", {}))
    stats.update(d.get("stats", {}))
total = sum(v for v in qs.values() if v > 0)
json.dump({"metric": "total", "value": round(total, 3), "unit": "sec",
           "queries": qs, "stats": stats, "sf": "isolated-per-query"},
          open(sys.argv[1], "w"))
EOF
rm -f "$OUT".jsonl
