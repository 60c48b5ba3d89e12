#!/bin/bash
# r14 re-record (VERDICT item 4): tpcds_report_run 20 -> 24 widening.
# Usage: bench_rec.sh <tag> <n_runs>
set -u
tag="$1"; n="$2"; shift 2 || true
cd /root/repo
for i in $(seq 1 "$n"); do
  out="scripts/r14/bench_${tag}_run${i}.json"
  python3 bench.py > "scripts/r14/bench_${tag}_run${i}.log" 2>&1
  tail -n 1 "scripts/r14/bench_${tag}_run${i}.log" > "$out"
  cp bench_metrics.json "scripts/r14/metrics_${tag}_run${i}.json" 2>/dev/null
  echo "=== ${tag} run ${i} done: $(date +%T)"
done
