#!/bin/bash
# Round-5 VERDICT #1 measurement batch: adaptive MALA/RWM rejuvenation vs
# the round-4 hand-tuned flagship. Runs SEQUENTIALLY (one TPU client at a
# time) from a repo snapshot so concurrent source edits cannot perturb
# later runs. Output: JSON lines + labels in ADAPTIVE_r05_raw.jsonl.
set -u
SNAP=/tmp/bench_snap_r05a
OUT=/root/repo/benchmarks/ADAPTIVE_r05_raw.jsonl
rm -rf "$SNAP"
cp -r /root/repo "$SNAP"
export PYTHONPATH="$SNAP:/root/.axon_site"
B="$SNAP/benchmarks/tomography_bench.py"
PROC="--process --process-qubits 2 --particles 50000 --shots 64 --chunk 100 --no-move-canonicalize --eig --eig-policy egreedy"

run() {
  echo "=== $1" >> "$OUT"
  shift
  timeout 2400 python "$B" "$@" >> "$OUT" 2>&1
  echo "--- exit $?" >> "$OUT"
}

run "probe mala-adapt 1000 (r4 baseline: 0.9327 @ 50.0s)" \
  $PROC --steps 1000 --moves 8 --adapt --mcmc-method mala
run "HEADLINE mala-adapt 4000 (r4 baseline: 0.9824 @ 84.5s)" \
  $PROC --steps 4000 --moves 8 --adapt --mcmc-method mala
run "rwm-adapt 4000 (isolate adaptation from gradient)" \
  $PROC --steps 4000 --moves 8 --adapt --mcmc-method rwm
run "mala-adapt 4000 moves=4 (better mixing -> fewer moves?)" \
  $PROC --steps 4000 --moves 4 --adapt --mcmc-method mala
run "family2: 3q states mala-adapt (r4 baseline: 0.9893 @ 2.3s)" \
  --qubits 3 --particles 50000 --steps 1000 --shots 32 --moves 8 \
  --chunk 250 --eig --eig-policy egreedy --adapt --mcmc-method mala
echo "=== batch done" >> "$OUT"
