#!/bin/bash
# Round-5 batch 9: periodic-projection probe on the composed flagship —
# project every K-th resample-move event instead of every event (the
# projection is ~40% of the composed wall; the zero-projection collapse
# took hundreds of events, so small K should contain the leak).
set -u
SNAP=/tmp/bench_snap_r05j
OUT=/root/repo/benchmarks/R05_BATCH9_raw.jsonl
rm -rf "$SNAP"
cp -r /root/repo "$SNAP"
export PYTHONPATH="$SNAP:/root/.axon_site"
B="$SNAP/benchmarks/tomography_bench.py"
PROC="--process --process-qubits 2 --particles 50000 --shots 64 --chunk 100 --no-move-canonicalize --eig --eig-policy egreedy --interval 4 --eig-interval 4"

run() {
  echo "=== $1" >> "$OUT"
  shift
  timeout 2400 python "$@" >> "$OUT" 2>&1
  echo "--- exit $?" >> "$OUT"
}

for K in 2 4 8; do
  run "composed rwm-adapt t0.14 8000 s0 project-every $K" \
    "$B" $PROC --steps 8000 --moves 8 --adapt --mcmc-method rwm --target-accept 0.14 --project-every $K
done
echo "=== batch9 done" >> "$OUT"
