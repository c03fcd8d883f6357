#!/usr/bin/env bash
# Durable re-run of the flagship seed-matched vanilla-vs-ERNODE MNIST
# pairs (the BASELINE.md headline table). Round 2 produced these under
# results/ (gitignored, evaporated between rounds — VERDICT-r3 weak #6);
# this regenerates them on the current engine straight into the
# committed evidence/ tree. Same setup as the reference's flagship
# experiment (experiments/mnist_node.jl): batch 512, Tsit5
# rtol=atol=1.4e-8, error_est lambda 1e2 -> 1e1, 10 epochs, two seeds.
set -u
cd "$(dirname "$0")/.."
OUT=evidence/r4_mnist_pair

run() {
  echo "=== $*"
  "$@" || echo "RUN FAILED (continuing): $*"
}

for seed in 1999 123; do
  run python experiments/mnist_node.py --config experiments/configs/mnist_node.yml \
    --epochs 10 --seed "$seed" --regularize false --results-dir "$OUT"
  run python experiments/mnist_node.py --config experiments/configs/mnist_node.yml \
    --epochs 10 --seed "$seed" --regularize true --reg-type error_est \
    --results-dir "$OUT"
done

find "$OUT" -name weights.npz -delete
echo "mnist pair runs complete; artifacts under $OUT"
