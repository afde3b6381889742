#!/bin/bash
# Round-5 batch 2: target-acceptance sweep on the flagship (the round-4
# hand-tuned rwm-5.0 ran at acceptance 0.12-0.16 and beat the RGG-target
# adaptive runs — in 255 constrained dims the diversification optimum
# sits BELOW the stationary-mixing optimum), the tolerant-LW A/B, the
# EIG amortization + auto-policy grid, and the config-2/3 rooflines.
# Sequential: ONE TPU client at a time.
set -u
SNAP=/tmp/bench_snap_r05b
OUT=/root/repo/benchmarks/R05_BATCH2_raw.jsonl
rm -rf "$SNAP"
cp -r /root/repo "$SNAP"
export PYTHONPATH="$SNAP:/root/.axon_site"
B="$SNAP/benchmarks/tomography_bench.py"
PROC="--process --process-qubits 2 --particles 50000 --shots 64 --chunk 100 --no-move-canonicalize --eig --eig-policy egreedy"
QB2="--qubits 2 --particles 200000"

run() {
  echo "=== $1" >> "$OUT"
  shift
  timeout 2400 python "$@" >> "$OUT" 2>&1
  echo "--- exit $?" >> "$OUT"
}

# A. flagship target sweep (tolerant-LW default in this snapshot)
run "rwm-adapt t0.14 4000 (hand-tuned ran acc 0.12-0.16 @ 0.9824)" \
  "$B" $PROC --steps 4000 --moves 8 --adapt --mcmc-method rwm --target-accept 0.14
run "mala-adapt t0.45 4000" \
  "$B" $PROC --steps 4000 --moves 8 --adapt --mcmc-method mala --target-accept 0.45
run "mala-adapt t0.35 4000" \
  "$B" $PROC --steps 4000 --moves 8 --adapt --mcmc-method mala --target-accept 0.35
run "mala-adapt t0.45 6000 (Pareto shot: >=0.985 under ~85s)" \
  "$B" $PROC --steps 6000 --moves 8 --adapt --mcmc-method mala --target-accept 0.45
run "mala-adapt t0.45 4000 STRICT resample canonicalize (LW A/B)" \
  "$B" $PROC --steps 4000 --moves 8 --adapt --mcmc-method mala --target-accept 0.45 --strict-resample-canonicalize

# B. EIG auto-policy grid (10 seeds x 2 horizons) + amortization overhead
for seed in 0 1 2 3 4 5 6 7 8 9; do
  run "eig auto s$seed 400" "$B" $QB2 --steps 400 --seed $seed --eig --eig-policy auto
  run "eig auto s$seed 60"  "$B" $QB2 --steps 60  --seed $seed --eig --eig-policy auto
done
for seed in 0 1 2; do
  run "eig egreedy-int4 s$seed 400" "$B" $QB2 --steps 400 --seed $seed --eig --eig-policy egreedy --eig-interval 4
  run "eig egreedy-int8 s$seed 400" "$B" $QB2 --steps 400 --seed $seed --eig --eig-policy egreedy --eig-interval 8
  run "eig egreedy-int4 s$seed 60"  "$B" $QB2 --steps 60  --seed $seed --eig --eig-policy egreedy --eig-interval 4
  run "eig egreedy-int1 s$seed 400" "$B" $QB2 --steps 400 --seed $seed --eig --eig-policy egreedy
  run "eig random s$seed 400"       "$B" $QB2 --steps 400 --seed $seed
done

# C. per-phase rooflines of BASELINE configs 2-3 + ensemble sweep
run "roofline models 2+3 sweep" "$SNAP/benchmarks/roofline_models.py" \
  --sweep --out /root/repo/benchmarks/ROOFLINE_MODELS_r05.json
echo "=== batch2 done" >> "$OUT"
