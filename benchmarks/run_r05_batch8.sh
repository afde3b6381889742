#!/bin/bash
# Round-5 batch 8: adaptive-kernel parity on the remaining tomography
# families + the missing waste-free table cells. Sequential.
set -u
SNAP=/tmp/bench_snap_r05i
OUT=/root/repo/benchmarks/R05_BATCH8_raw.jsonl
rm -rf "$SNAP"
cp -r /root/repo "$SNAP"
export PYTHONPATH="$SNAP:/root/.axon_site"
B="$SNAP/benchmarks/tomography_bench.py"

run() {
  echo "=== $1" >> "$OUT"
  shift
  timeout 2400 python "$@" >> "$OUT" 2>&1
  echo "--- exit $?" >> "$OUT"
}

run "3q states rwm-adapt t0.14 (hand-tuned r4: 0.9893 @ 2.3s)" \
  "$B" --qubits 3 --particles 50000 --steps 1000 --shots 32 --chunk 250 \
  --eig --eig-policy egreedy --moves 8 --adapt --mcmc-method rwm --target-accept 0.14
run "1q channels mala-adapt (hand-tuned r4: 0.9893 @ 0.55s)" \
  "$B" --process --particles 100000 --steps 400 --shots 0 --chunk 200 \
  --eig --eig-policy egreedy --moves 8 --adapt --mcmc-method mala
run "1q states wf P=10 lwseed (r4 wf rwm: 0.9997 @ 0.31s)" \
  "$B" --qubits 1 --particles 500000 --steps 200 --chunk 100 --shots 0 \
  --eig --eig-policy egreedy --moves 1 --waste-free 10 --waste-free-lw-seed 0.98
run "3q states wf P=10 pcn lwseed (missing table cell)" \
  "$B" --qubits 3 --particles 50000 --steps 1000 --shots 32 --chunk 250 \
  --eig --eig-policy egreedy --moves 1 --waste-free 10 \
  --waste-free-kernel pcn --waste-free-beta 0.3 --waste-free-lw-seed 0.98
echo "=== batch8 done" >> "$OUT"
