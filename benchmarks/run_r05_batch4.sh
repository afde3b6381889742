#!/bin/bash
# Round-5 batch 4: re-measure BASELINE configs 2-3 through the PUBLIC
# engine path on the round-5 engine (the r3 numbers predate the gated
# resample + engine fixes), add the 'engine' roofline variant on-chip,
# and pre-check the driver headline bench. Sequential: ONE TPU client.
set -u
SNAP=/tmp/bench_snap_r05e
OUT=/root/repo/benchmarks/R05_BATCH4_raw.jsonl
rm -rf "$SNAP"
cp -r /root/repo "$SNAP"
export PYTHONPATH="$SNAP:/root/.axon_site"

run() {
  echo "=== $1" >> "$OUT"
  shift
  timeout 2400 python "$@" >> "$OUT" 2>&1
  echo "--- exit $?" >> "$OUT"
}

run "models_bench r5 (r3: ramsey 7.3e7, rb 3.4e7)" \
  "$SNAP/benchmarks/models_bench.py"
run "roofline engine variant on-chip" \
  "$SNAP/benchmarks/roofline_models.py" \
  --out /root/repo/benchmarks/ROOFLINE_MODELS_r05b.json
run "headline bench pre-check" "$SNAP/bench.py"
echo "=== batch4 done" >> "$OUT"
