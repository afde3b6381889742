#!/bin/bash
# Round-5 batch 7: 3-seed the interval-4 composed point (s0 read 0.9865
# @ 91.7 s = r4-equal fidelity at -20% wall) and probe the auto policy
# on the 256-candidate flagship pool.
set -u
SNAP=/tmp/bench_snap_r05h
OUT=/root/repo/benchmarks/R05_BATCH7_raw.jsonl
rm -rf "$SNAP"
cp -r /root/repo "$SNAP"
export PYTHONPATH="$SNAP:/root/.axon_site"
B="$SNAP/benchmarks/tomography_bench.py"
P4="--process --process-qubits 2 --particles 50000 --shots 64 --chunk 100 --no-move-canonicalize --eig --interval 4 --eig-interval 4"

run() {
  echo "=== $1" >> "$OUT"
  shift
  timeout 2400 python "$@" >> "$OUT" 2>&1
  echo "--- exit $?" >> "$OUT"
}

for seed in 1 2; do
  run "composed rwm-adapt t0.14 8000 s$seed (int4+eigint4)" \
    "$B" $P4 --eig-policy egreedy --steps 8000 --moves 8 --adapt --mcmc-method rwm --target-accept 0.14 --seed $seed
done
run "composed rwm-adapt t0.14 8000 s0 AUTO policy (int4+eigint4)" \
  "$B" $P4 --eig-policy auto --steps 8000 --moves 8 --adapt --mcmc-method rwm --target-accept 0.14 --seed 0
echo "=== batch7 done" >> "$OUT"
