#!/bin/bash
# Round-5 TPU tail (run serially after the seed queue drains):
#   1. phase-level perf A/B (donation / bf16 / fused-trainbn-under-bf16)
#   2. zoo throughput rows for part-seg + S3DIS (VERDICT r4 #6)
#   3. fresh headline bench
#   4. compile-cache prewarm for the driver's end-of-round bench
# Usage: bash scripts/run_tpu_r5_tail.sh [stage]  (opts|zoo|bench|prewarm|all)
set -e
cd "$(dirname "$0")/.."

run_opts() { timeout 1200 python scripts/check_phase_opts.py; }
run_zoo() {
  for m in pointnext-s@shapenetpart pointnext-s@s3dis pointnext-b@s3dis \
           pointnext-l@s3dis pointnext-xl@s3dis; do
    timeout 900 python scripts/bench_zoo.py "$m" || true
  done
}
run_bench() { timeout 900 python bench.py; }
run_prewarm() { bash scripts/ci_tpu.sh --no-bench || true; }

stage="${1:-all}"
case "$stage" in
  opts) run_opts ;;
  zoo) run_zoo ;;
  bench) run_bench ;;
  prewarm) run_prewarm ;;
  all) run_opts; run_zoo; run_bench; run_prewarm ;;
  *) echo "unknown stage $stage"; exit 1 ;;
esac
