#!/bin/bash
# Round-5 batch 6: the composed self-tuning flagship recipe at interval
# 8 — 3 seeds. r4 reference: 0.985-0.987 @ 114 s (hand-tuned rwm-5.0).
# Interval-4 composition measured 0.9865 @ 91.7 s (-20% wall); interval
# 8 targets the >=25% cut at equal fidelity.
set -u
SNAP=/tmp/bench_snap_r05g
OUT=/root/repo/benchmarks/R05_BATCH6_raw.jsonl
rm -rf "$SNAP"
cp -r /root/repo "$SNAP"
export PYTHONPATH="$SNAP:/root/.axon_site"
B="$SNAP/benchmarks/tomography_bench.py"
PROC="--process --process-qubits 2 --particles 50000 --shots 64 --chunk 100 --no-move-canonicalize --eig --eig-policy egreedy --interval 8 --eig-interval 8"

run() {
  echo "=== $1" >> "$OUT"
  shift
  timeout 2400 python "$@" >> "$OUT" 2>&1
  echo "--- exit $?" >> "$OUT"
}

for seed in 0 1 2; do
  run "composed rwm-adapt t0.14 8000 s$seed (int8+eigint8)" \
    "$B" $PROC --steps 8000 --moves 8 --adapt --mcmc-method rwm --target-accept 0.14 --seed $seed
done
echo "=== batch6 done" >> "$OUT"
