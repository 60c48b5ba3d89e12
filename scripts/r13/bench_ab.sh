#!/bin/bash
# r13 A/B experiment (VERDICT item 1): composite-phase inflation.
# Usage: bench_ab.sh <tag> <n_runs> [env KEY=VAL ...]
set -u
tag="$1"; n="$2"; shift 2
cd /root/repo
for i in $(seq 1 "$n"); do
  out="scripts/r13/bench_${tag}_run${i}.json"
  env "$@" python3 bench.py > "scripts/r13/bench_${tag}_run${i}.log" 2>&1
  tail -n 1 "scripts/r13/bench_${tag}_run${i}.log" > "$out"
  cp bench_metrics.json "scripts/r13/metrics_${tag}_run${i}.json" 2>/dev/null
  echo "=== ${tag} run ${i} done: $(date +%T)"
done
