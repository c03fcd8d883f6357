#!/usr/bin/env bash
# Latent-ODE NFE-reduction demonstration runs (VERDICT-r3 #2).
#
# The f64 SNR sweep (evidence/r4_latent_regime/snr_sweep.txt,
# tools/lode_f64_probe.py) locates the regime where the f32 EEst*dt
# gradient carries real signal on this surrogate: rtol=1e-3 (cos ~0.95
# vs ~0.15-0.45 at the reference's 1.4e-8), stronger still on the
# rougher REGNDE_SURROGATE_FREQ=4,12 band that also gives the latent
# dynamics room to stiffen. Seed-matched vanilla-vs-ERNODE pairs, two
# seeds. Relation to the reference setting: same model/loss/schedules
# as experiments/latent_ode.jl:154-192, tolerance loosened 1.4e-8 ->
# 1e-3 and surrogate roughened — the changes the round-3 probe showed
# are REQUIRED for the f32 error signal to clear the noise floor that
# real physionet's rough trajectories clear naturally.
set -u
cd "$(dirname "$0")/.."
OUT=evidence/r4_latent_regime
export REGNDE_SURROGATE_FREQ=4,12

run() {
  echo "=== $*"
  "$@" || echo "RUN FAILED (continuing): $*"
}

for seed in 1999 123; do
  run python experiments/latent_ode.py --config experiments/configs/latent_ode.yml \
    --epochs 120 --batch-size 256 --seed "$seed" --rtol 1e-3 --atol 1e-3 \
    --regularize false --results-dir "$OUT"
  run python experiments/latent_ode.py --config experiments/configs/latent_ode.yml \
    --epochs 120 --batch-size 256 --seed "$seed" --rtol 1e-3 --atol 1e-3 \
    --regularize true --reg-type error_est --results-dir "$OUT"
done

find "$OUT" -name weights.npz -delete
echo "latent regime runs complete; artifacts under $OUT"
