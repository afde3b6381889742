#!/bin/bash
# On-chip EIG-policy comparison grid (VERDICT r3 #2): 2-qubit state
# tomography at 200k particles, horizons 400 and 60, policies
# random / greedy / egreedy / softmax, two seeds each.
# Sequential by design: ONE TPU client at a time.
set -u
cd /root/repo
B="python benchmarks/tomography_bench.py --qubits 2 --particles 200000"
for seed in 0 1; do
  for steps in 400 60; do
    $B --steps $steps --seed $seed 2>/dev/null | tail -1
    $B --steps $steps --seed $seed --eig --eig-policy greedy 2>/dev/null | tail -1
    $B --steps $steps --seed $seed --eig --eig-policy egreedy 2>/dev/null | tail -1
    $B --steps $steps --seed $seed --eig --eig-policy softmax 2>/dev/null | tail -1
  done
done
