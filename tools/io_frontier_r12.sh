#!/usr/bin/env bash
# Round-12 frontier extension (r11 verdict items 5+6): run the
# warm-vs-cold leg for ann_recall_eval (post Checkpoints.releaseAll fix)
# and the dedup/ANN/curation PRODUCTION routes against the ~17 GB K=1000
# corpus. Same protocol as tools/io_frontier.sh: drop page caches before
# each query's JVM, run1 = cold (parquet from disk), run2/3 = warm.
#
# Requires root (drop_caches). Writes nothing inside the repo.
# Usage: tools/io_frontier_r12.sh [corpusDir] [outDir]
set -euo pipefail
cd "$(dirname "$0")/.."
CORPUS="${1:-/tmp/sf100_synth}"
OUT="${2:-/tmp/io_frontier_r12}"
mkdir -p "$OUT"

QS="ann_recall_eval,dedup_minhash_lsh,dedup_simhash,pipeline_curate,emb_knn_graph_ivf"

for q in ${QS//,/ }; do
  [ -s "$OUT/$q.txt" ] && { echo "skip $q (exists)"; continue; }
  # the 2M-vector IVF kNN graph runs ~12 min/rep: cold + one warm rep
  RUNS=3; TMO=2400
  [ "$q" = emb_knn_graph_ivf ] && { RUNS=2; TMO=3600; }
  sync
  echo 3 > /proc/sys/vm/drop_caches
  timeout $TMO env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    sbt -batch "runMain graft.tools.TimeOne $q $CORPUS $RUNS" \
    > "$OUT/$q.raw" 2>&1 || echo "TIMEOUT-OR-FAIL $q" >> "$OUT/$q.raw"
  grep -E "run[0-9]:|TIMEOUT" "$OUT/$q.raw" > "$OUT/$q.txt" || true
  cat "$OUT/$q.txt"
done
echo "done -> $OUT"
