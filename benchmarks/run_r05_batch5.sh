#!/bin/bash
# Round-5 batch 5: the composed round-5 recipe — adaptive kernel +
# interval-gated ESS checks + amortized EIG — at the 8000-step horizon.
# r4 reference: rwm-5.0 hand-tuned, every-step EIG + gate: 0.985-0.987
# @ 114 s. Target: equal fidelity at >=25% less wall, 3 seeds.
set -u
SNAP=/tmp/bench_snap_r05f
OUT=/root/repo/benchmarks/R05_BATCH5_raw.jsonl
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

for seed in 0 1 2; do
  run "composed mala-adapt 8000 s$seed (int4+eigint4)" \
    "$B" $PROC --steps 8000 --moves 8 --adapt --mcmc-method mala --seed $seed
done
run "composed rwm-adapt t0.14 8000 s0 (int4+eigint4)" \
  "$B" $PROC --steps 8000 --moves 8 --adapt --mcmc-method rwm --target-accept 0.14 --seed 0
run "plain rwm-adapt t0.14 8000 s0 (adaptive matches hand-tuned at r4 horizon)" \
  "$B" --process --process-qubits 2 --particles 50000 --shots 64 --chunk 100 --no-move-canonicalize --eig --eig-policy egreedy --steps 8000 --moves 8 --adapt --mcmc-method rwm --target-accept 0.14 --seed 0
# plain-MALA robustness: seed 2 read 0.681 in batch 2b (early wrong-basin
# commitment); grow the sample to estimate the outlier rate
for seed in 3 4 5; do
  run "plain mala-adapt 8000 s$seed (outlier-rate probe)" \
    "$B" --process --process-qubits 2 --particles 50000 --shots 64 --chunk 100 --no-move-canonicalize --eig --eig-policy egreedy --steps 8000 --moves 8 --adapt --mcmc-method mala --seed $seed
done
echo "=== batch5 done" >> "$OUT"
