#!/usr/bin/env bash
# Round-10 scaling capture: time the top-N floor queries at sf0.1 and at a
# deterministic ~10x replica (tools/gen_scale10.py), then emit per-query
# ratios. A query scaling worse than 2x the data ratio is an accidental
# super-linearity (candidate-pair blowup, global window, driver collect).
#
# Usage: tools/scaling_capture.sh [out_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/scaling_r10}"
mkdir -p "$OUT"
SYNTH=/tmp/sf1_synth
TOP25=$(python3 - <<'EOF'
import json
d = json.load(open('bench_detail.json'))
top = sorted(d['queries'].items(), key=lambda kv: -kv[1])[:25]
print(','.join(k for k, _ in top))
EOF
)
echo "queries: $TOP25"
[ -d "$SYNTH" ] || python3 tools/gen_scale10.py /root/testdata/sf0.1 "$SYNTH" 10

run_sf() { # $1=sfdir $2=tag  (skips a leg whose detail file already exists,
           #  so a killed capture resumes at the missing leg)
  [ -s "$OUT/detail_$2.json" ] && { echo "skip $2 (exists)"; return; }
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$1" \
  SPARK_GRAFT_BENCH_DETAIL="$OUT/detail_$2.json" \
  SPARK_GRAFT_BENCH_ONLY="$TOP25" \
  SPARK_GRAFT_BENCH_SAMPLES=2 SPARK_GRAFT_BENCH_MAX_SAMPLES=4 \
  SPARK_GRAFT_BENCH_TIMEOUT_SEC="${SPARK_GRAFT_BENCH_TIMEOUT_SEC:-240}" \
  SPARK_DRIVER_MEM=24g \
  sbt -batch "runMain graft.Bench" >"$OUT/stdout_$2.txt" 2>"$OUT/stderr_$2.txt"
}

run_sf /root/testdata/sf0.1 sf01
run_sf "$SYNTH" sf1
python3 tools/scaling_report.py "$OUT/detail_sf01.json" "$OUT/detail_sf1.json" 10
