#!/bin/bash
# Round-5 batch 3: waste-free intermediate kernels at 63 and 255 dims
# (VERDICT r4 #6 — the plain RWM chain collapsed at 255 dims in r4:
# 0.45 fidelity at P=10 and P=50). pCN chains and LW-seeded ancestors,
# one measured row per (dimension, kernel). Sequential: ONE TPU client.
set -u
SNAP=/tmp/bench_snap_r05c
OUT=/root/repo/benchmarks/R05_BATCH3_raw.jsonl
rm -rf "$SNAP"
cp -r /root/repo "$SNAP"
export PYTHONPATH="$SNAP:/root/.axon_site"
B="$SNAP/benchmarks/tomography_bench.py"
# r4 rows used: 3q states 1000x32shot, 2q channels 1000x64shot, both
# with EIG-egreedy and --moves 1 to enable the sufficient path (the
# move count is ignored when --waste-free > 0)
ST3="--qubits 3 --particles 50000 --steps 1000 --shots 32 --chunk 250 --eig --eig-policy egreedy --moves 1"
CH2="--process --process-qubits 2 --particles 50000 --steps 1000 --shots 64 --chunk 100 --no-move-canonicalize --eig --eig-policy egreedy --moves 1"

run() {
  echo "=== $1" >> "$OUT"
  shift
  timeout 2400 python "$B" "$@" >> "$OUT" 2>&1
  echo "--- exit $?" >> "$OUT"
}

# 63 dims (r4 rwm P=10: 0.9584 / 0.71 s)
run "3q wf P=10 pcn b0.3" $ST3 --waste-free 10 --waste-free-kernel pcn --waste-free-beta 0.3
run "3q wf P=10 rwm lwseed .98" $ST3 --waste-free 10 --waste-free-lw-seed 0.98
# 255 dims (r4 rwm P=10 and P=50: ~0.45)
run "2qch wf P=10 pcn b0.3" $CH2 --waste-free 10 --waste-free-kernel pcn --waste-free-beta 0.3
run "2qch wf P=10 pcn b0.3 lwseed .98" $CH2 --waste-free 10 --waste-free-kernel pcn --waste-free-beta 0.3 --waste-free-lw-seed 0.98
run "2qch wf P=10 rwm lwseed .98" $CH2 --waste-free 10 --waste-free-lw-seed 0.98
echo "=== batch3 done" >> "$OUT"
