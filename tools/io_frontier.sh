#!/usr/bin/env bash
# Round-11 IO-frontier capture (r10 verdict #3): run the scan family and
# the heaviest floor operators against a ~17 GB K=1000 corpus
# (tools/gen_scale10.py K=1000 -> /tmp/sf100_synth, lineitem 600M rows),
# COLD vs WARM page cache. Cold = `echo 3 > /proc/sys/vm/drop_caches`
# before each query's JVM, so run1 reads parquet from disk and run2 from
# page cache - the warm/cold delta is pure IO, measured inside one JVM.
#
# Requires root (drop_caches). Writes nothing inside the repo.
# Usage: tools/io_frontier.sh [corpusDir] [outDir]
set -euo pipefail
cd "$(dirname "$0")/.."
CORPUS="${1:-/tmp/sf100_synth}"
OUT="${2:-/tmp/io_frontier_r11}"
mkdir -p "$OUT"

SCAN="ref_full_scan,ref_filter,ref_aggregation,q1_pricing_summary,q6_revenue_forecast"
HEAVY="ann_recall_eval,dedup_keep_best,graph_reach,mm_scene_cuts,dedup_cc"

for q in ${SCAN//,/ } ${HEAVY//,/ }; do
  [ -s "$OUT/$q.txt" ] && { echo "skip $q (exists)"; continue; }
  sync
  echo 3 > /proc/sys/vm/drop_caches
  # run1 = cold (files untouched since the drop), run2/3 = warm
  timeout 1200 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    sbt -batch "runMain graft.tools.TimeOne $q $CORPUS 3" \
    > "$OUT/$q.raw" 2>&1 || echo "TIMEOUT-OR-FAIL $q" >> "$OUT/$q.raw"
  grep -E "run[0-9]:|TIMEOUT" "$OUT/$q.raw" > "$OUT/$q.txt" || true
  cat "$OUT/$q.txt"
done
echo "done -> $OUT"
