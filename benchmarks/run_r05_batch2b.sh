#!/bin/bash
# Round-5 batch 2b (after batch-2 findings): the remaining strict-form
# target point (rwm acceptance-matched to the hand-tuned kernel) plus
# the 3-seed 8000-step MALA Pareto confirmation (r4 rwm-5.0 reference:
# 0.985-0.987 @ 114 s).
set -u
SNAP=/tmp/bench_snap_r05d
OUT=/root/repo/benchmarks/R05_BATCH2B_raw.jsonl
rm -rf "$SNAP"
cp -r /root/repo "$SNAP"
export PYTHONPATH="$SNAP:/root/.axon_site"
B="$SNAP/benchmarks/tomography_bench.py"
PROC="--process --process-qubits 2 --particles 50000 --shots 64 --chunk 100 --no-move-canonicalize --eig --eig-policy egreedy"

run() {
  echo "=== $1" >> "$OUT"
  shift
  timeout 2400 python "$@" >> "$OUT" 2>&1
  echo "--- exit $?" >> "$OUT"
}

run "rwm-adapt t0.14 4000 strict-form (acceptance-matched to hand-tuned)" \
  "$B" $PROC --steps 4000 --moves 8 --adapt --mcmc-method rwm --target-accept 0.14
for seed in 0 1 2; do
  run "mala-adapt 8000 s$seed (Pareto: r4 rwm 0.985-0.987 @ 114s)" \
    "$B" $PROC --steps 8000 --moves 8 --adapt --mcmc-method mala --seed $seed
done
echo "=== batch2b done" >> "$OUT"
