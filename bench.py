"""Headline benchmark: both north-star metrics (BASELINE.json).

1. MNIST Neural-ODE regularized training throughput — wall-clock
   throughput of the flagship classifier with error-estimate
   regularization at the reference configuration (batch 512, Tsit5,
   rtol=atol=1.4e-8, lambda=1e2, InvDecay+Momentum — reference:
   experiments/mnist_node.jl:115-130), one jitted program per step.
2. Physionet latent-ODE training throughput — the regularized latent-ODE
   train step (batch 256, saveat=49 stamps, Tsit5 rtol=atol=1.4e-8 —
   reference: experiments/latent_ode.jl:104-192) on the physionet-schema
   data (real bundle when present, synthetic surrogate otherwise).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
primary (MNIST) metric, with the latent-ODE numbers carried as extra keys
(``latent_ode_samples_per_sec``, ``latent_ode_vs_baseline``).

``vs_baseline`` compares against the reference's CPU training throughput
stand-in recorded in BASELINE.md. The reference repo publishes no numbers
and Julia is unavailable in this image, so the baseline is this same
workload executed by XLA:CPU on one core (measured once, recorded below) —
both are f32 BLAS-bound adaptive Tsit5 training loops, which makes this the
honest available proxy for "CPU-reference training throughput" from
BASELINE.json's north star (">5x CPU-reference throughput on one v5e").
"""

import json
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path.home() / ".cache" / "regneuralde_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import functools

import flax.linen as nn
import optax

from regneuralde_tpu import reg
from regneuralde_tpu.models import ClassifierNODE, MLPDynamics, NeuralODE
from regneuralde_tpu.training import (
    TrainState,
    create_train_state,
    make_multi_step,
    mnist_node_optimizer,
)

BATCH = 512
# Solves take ~36 trial steps at rtol=1.4e-8 with the accurate-tanh
# dynamics. mode="adjoint" (the NeuralODE default) pays only for live
# steps in both directions, so the cap is pure safety headroom now —
# raising it costs history memory (max_steps x state), not time.
MAX_STEPS = 96
WARMUP = 2
MEASURE = 10

# Reference-CPU stand-in: this benchmark body on XLA:CPU (1 core of this
# image, batch 64: 0.60 s/step = 106.5 samples/s; throughput is
# batch-size-invariant because flops scale linearly and the adaptive step
# count is set by the global error norm). See BASELINE.md.
CPU_BASELINE_SAMPLES_PER_SEC = 106.5

# Latent-ODE stand-in measured the same way (XLA:CPU one core). Round 3
# MEASURED the batch dependence instead of asserting invariance: 757.6
# samples/s at batch 64 vs 852.6 at batch 256 (the TPU benchmark batch) —
# near-invariant, mildly better at the larger batch. The matched-batch
# (256) number is used as the baseline; the tiny latent model is far less
# BLAS-bound than the MNIST dynamics, so the CPU does relatively better.
LATENT_BATCH = 256
LATENT_MAX_STEPS = 256
LATENT_CPU_BASELINE_SAMPLES_PER_SEC = 852.6
LATENT_MEASURE = 6


def build():
    import jax.numpy as jnp

    from regneuralde_tpu.data import load_mnist

    node = NeuralODE(
        MLPDynamics(dim=784, hidden=100),
        tspan=(0.0, 1.0),
        solver="tsit5",
        rtol=1.4e-8,
        atol=1.4e-8,
        max_steps=MAX_STEPS,
        # Fused Pallas trial step (all six RK stages VMEM-resident):
        # 34.7 ms/step vs 53.5 ms/step for the generic XLA sweep.
        fused=jax.default_backend() != "cpu",
    )
    clf = ClassifierNODE(None, node, nn.Dense(10))
    # Real data, iterated batch-to-batch as in the experiment: repeating
    # one batch (or random labels) overfits within a dozen steps and
    # drives the dynamics into an arbitrarily stiff regime whose NFE
    # diverges to the step cap — unrepresentative of training throughput.
    train_loader, _ = load_mnist(BATCH, flatten=True, seed=0)
    batches = []
    while len(batches) < WARMUP + MEASURE:  # cycle epochs if needed
        for xb, yb in train_loader:
            if xb.shape[0] == BATCH:
                batches.append((jnp.asarray(xb), jnp.asarray(yb)))
            if len(batches) >= WARMUP + MEASURE:
                break
    x, y = batches[0]
    params = clf.init(jax.random.PRNGKey(2), x)
    optimizer = mnist_node_optimizer()

    def loss_fn(params, x, y):
        out = clf(params, x)
        ce = optax.softmax_cross_entropy(out.logits, y).mean()
        r = reg.error_estimate(out.telemetry, agg="mean")
        return ce + 100.0 * r, out.nfe

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, x, y):
        (loss, nfe), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, x, y)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss, nfe

    # Multi-step engine: K train steps per dispatch (lax.scan over stacked
    # batches). The per-dispatch tunnel latency is ~1.9 ms (measured round
    # 4 against a trivial jit program) vs ~9.6 ms device time for this
    # step — multi-step amortizes that fixed tax to ~0.2 ms/step.
    # donate=False so the warm (compile) call and the timed call replay
    # the IDENTICAL 10-step trajectory from the same post-warmup state —
    # the param copy this costs is ~4MB, noise at this scale.
    multi_step = make_multi_step(
        lambda p, x, y: (lambda lo: (lo[0], {"nfe": lo[1]}))(loss_fn(p, x, y)),
        optimizer, has_aux=True, donate=False)

    return train_step, multi_step, create_train_state(params, optimizer), batches


def build_latent():
    """The latent-ODE regularized train step at the reference shape
    (experiments/latent_ode.jl:104-192): masked-GRU encoder, latent-20 ODE
    with AlternatingMLP dynamics decoded at the 49 stamps, masked Gaussian
    LL (sigma=0.01) + KL + EEst*dt regularizer."""
    import jax.numpy as jnp
    import optax

    from regneuralde_tpu import reg
    from regneuralde_tpu.data import load_physionet
    from regneuralde_tpu.models import (
        MLP, AlternatingMLP, LatentGRU, LatentTimeSeriesModel, NeuralODE)
    from regneuralde_tpu.training import (
        TrainState, create_train_state, latent_ode_optimizer)

    train_loader, _ = load_physionet(LATENT_BATCH, seed=0)
    batches = []
    while len(batches) < WARMUP + LATENT_MEASURE:
        for b in train_loader:
            if b[0].shape[0] == LATENT_BATCH:
                batches.append(tuple(jnp.asarray(a) for a in b[:6]))
            if len(batches) >= WARMUP + LATENT_MEASURE:
                break
    d0, m0, _, _, tp0, _ = batches[0]
    saveat = jnp.sort(tp0[0])

    node = NeuralODE(
        AlternatingMLP(dim=20, hidden=50, depth=4), time_dep=False,
        solver="tsit5", rtol=1.4e-8, atol=1.4e-8,
        max_steps=LATENT_MAX_STEPS, saveat=saveat,
        fused=jax.default_backend() != "cpu",
    )
    import flax.linen as nn

    model = LatentTimeSeriesModel(
        rnn=LatentGRU(in_dim=37, hidden=40, latent_dim=50),
        enc=MLP(features=(50, 2 * 20)), node=node, dec=nn.Dense(37))

    def inputs(d, m, tp):
        dt = jnp.concatenate([tp[:, 1:] - tp[:, :-1],
                              jnp.zeros_like(tp[:, :1])], 1)
        return jnp.concatenate([d, m, dt[..., None]], axis=-1)

    params = model.init(jax.random.PRNGKey(3), inputs(d0, m0, tp0))
    optimizer = latent_ode_optimizer()
    sigma = 0.01

    def loss_fn(params, d, m, tp, key):
        out = model(params, inputs(d, m, tp), key, saveat=saveat)
        err = (out.result - d) * m
        ll = jnp.sum(-jnp.square(err) / (2 * sigma**2), axis=(1, 2))
        ll = ll / jnp.maximum(jnp.sum(m, axis=(1, 2)), 1.0)
        kl = jnp.mean(jnp.exp(out.logvar) + jnp.square(out.mu0) - 1
                      - out.logvar, axis=-1) / 2
        r = reg.error_estimate(out.telemetry, agg="mean")
        return -jnp.mean(ll - kl) + 1e3 * r, out.nfe

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, d, m, tp, key):
        (loss, nfe), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, d, m, tp, key)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss, nfe

    multi_step = make_multi_step(
        lambda p, d, m, tp, k: (lambda lo: (lo[0], {"nfe": lo[1]}))(
            loss_fn(p, d, m, tp, k)),
        optimizer, has_aux=True, donate=False)

    return train_step, multi_step, create_train_state(params, optimizer), batches


def measure_latent():
    import jax.numpy as jnp
    import numpy as np

    train_step, multi_step, state, batches = build_latent()
    key = jax.random.PRNGKey(9)
    for d, m, _, _, tp, _ in batches[:WARMUP]:
        key, sk = jax.random.split(key)
        state, loss, nfe = train_step(state, d, m, tp, sk)
    float(np.asarray(loss))

    meas = batches[WARMUP:WARMUP + LATENT_MEASURE]
    ds = jnp.stack([b[0] for b in meas])
    ms = jnp.stack([b[1] for b in meas])
    tps = jnp.stack([b[4] for b in meas])
    sks = jax.random.split(key, LATENT_MEASURE)
    _, losses, auxs = multi_step(state, ds, ms, tps, sks)  # compile + warm
    float(np.asarray(losses[-1]))
    times = []
    for _ in range(3):  # median-of-3: see the flagship timing note below
        t0 = time.perf_counter()
        _, losses, auxs = multi_step(state, ds, ms, tps, sks)
        float(np.asarray(losses[-1]))
        times.append(time.perf_counter() - t0)
    return (LATENT_BATCH * LATENT_MEASURE / float(np.median(times)),
            int(auxs["nfe"][-1]))


def run_tpu_regressions():
    """Run tools/tpu_regressions.py in a subprocess; return pass/fail counts.

    On-device gradient regressions (bf16 backward poisoning, fused-kernel
    gradient parity) are invisible to the CPU test mesh; folding their
    counts into the bench JSON means a TPU-only regression can never ship
    behind a green suite and a plausible throughput number.
    """
    import re
    import subprocess
    import sys

    if jax.default_backend() == "cpu":
        return {"passed": 0, "failed": 0, "skipped": "cpu backend"}
    try:
        proc = subprocess.run(
            [sys.executable, str(Path(__file__).parent / "tools"
                                 / "tpu_regressions.py")],
            capture_output=True, text=True, timeout=2400)
    except subprocess.TimeoutExpired:
        return {"passed": 0, "failed": -1, "error": "timeout"}
    out = proc.stdout + proc.stderr
    passed = len(re.findall(r"^PASS ", out, re.M))
    failed = len(re.findall(r"^FAIL ", out, re.M))
    res = {"passed": passed, "failed": failed}
    if proc.returncode != 0 and failed == 0:
        res["error"] = f"exit {proc.returncode}: {out[-300:]}"
    return res


# The flagship's accepted-step count at rtol=1.4e-8 with the accurate-tanh
# dynamics. Pinned so a perf "win" can never come from silent step-count
# drift: a violation makes the bench exit nonzero (after printing the
# JSON). The single-dispatch engine is pinned EXACTLY (it is the engine
# prior rounds recorded); the multi-step scan engine lowers to different
# XLA fusions, whose f32 roundoff flips at most one accept/reject on the
# controller boundary (measured: 218 vs 224 at step 10), so it is allowed
# ONE Tsit5 trial step (6 fresh evals under FSAL) of drift — but (round 5,
# VERDICT-r4 #6) any drift is (a) reported as its own field and (b)
# CHARGED: the headline throughput is scaled by nfe/expected, so fewer
# steps can never read as a perf win.
EXPECTED_FLAGSHIP_NFE = 224
NFE_TRIAL_STEP = 6


def main():
    import jax.numpy as jnp
    import numpy as np

    train_step, multi_step, state, batches = build()
    for x, y in batches[:WARMUP]:
        state, loss, nfe = train_step(state, x, y)
    float(np.asarray(loss))
    # Both engines replay the SAME 10-step trajectory from this state, so
    # the multi-step aux NFE is comparable to the single-dispatch one and
    # the NFE pin below cannot trip on extra optimization progress.
    # Deep-copy: train_step donates its state argument, so the timed loop
    # below would otherwise delete state0's buffers out from under the
    # multi-step engine.
    state0 = jax.tree.map(jnp.array, state)

    # Median of REPS replays of the identical trajectory: a one-shot
    # 100 ms timing through the tunnel-attached runtime measured +-20%
    # run-to-run (round 5, /tmp/probe_multistep_var), which is larger
    # than any engine delta under study. Each rep restarts from a fresh
    # copy of state0, so every rep times the same device program on the
    # same data.
    REPS = 3
    single_times = []
    for _ in range(REPS):
        st = jax.tree.map(jnp.array, state0)
        t0 = time.perf_counter()
        for x, y in batches[WARMUP:WARMUP + MEASURE]:
            st, loss, nfe = train_step(st, x, y)
        # Sync via an actual device-to-host read: on the axon backend
        # block_until_ready can return before the async step chain has
        # executed, inflating throughput ~300x. Verified: timing scales
        # linearly in MEASURE with this sync.
        float(np.asarray(loss))
        single_times.append(time.perf_counter() - t0)

    single_dispatch_sps = BATCH * MEASURE / float(np.median(single_times))
    nfe_single = int(nfe)

    # Multi-step (K=MEASURE steps per dispatch): the headline. Same
    # gradients/optimizer chain per step (pinned by
    # tests/test_data_utils_training.py); the only difference is ONE
    # dispatch instead of MEASURE.
    xs = jnp.stack([b[0] for b in batches[WARMUP:WARMUP + MEASURE]])
    ys = jnp.stack([b[1] for b in batches[WARMUP:WARMUP + MEASURE]])
    _, losses, auxs = multi_step(state0, xs, ys)  # compile + warm
    float(np.asarray(losses[-1]))
    multi_times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _, losses, auxs = multi_step(state0, xs, ys)  # same trajectory
        float(np.asarray(losses[-1]))
        multi_times.append(time.perf_counter() - t0)
    samples_per_sec = BATCH * MEASURE / float(np.median(multi_times))
    nfe = auxs["nfe"][-1]

    latent_sps, latent_nfe = measure_latent()

    tpu_reg = run_tpu_regressions()
    # Single-dispatch engine: exact pin (the engine prior rounds recorded).
    # Multi-step scan engine: within ONE trial step of the pin (different
    # XLA lowering, f32 roundoff can flip one controller accept/reject) —
    # and the headline is NFE-NORMALIZED below, so drift inside the band
    # cannot masquerade as throughput.
    # The pin (and the equal-work normalization) only mean anything at
    # the flagship configuration; smoke harnesses shrink BATCH/MAX_STEPS
    # and legitimately land on a different step count.
    flagship_shape = BATCH == 512 and MAX_STEPS == 96
    drift = int(nfe) - EXPECTED_FLAGSHIP_NFE
    nfe_ok = (not flagship_shape
              or (nfe_single == EXPECTED_FLAGSHIP_NFE
                  and abs(drift) <= NFE_TRIAL_STEP))
    # Equal-work normalization: charge the multi-step engine as if it had
    # executed exactly the pinned NFE (a 218-NFE run's samples/s scales by
    # 218/224). Exact-pin runs are unchanged.
    samples_per_sec_norm = (samples_per_sec
                            * (int(nfe) / EXPECTED_FLAGSHIP_NFE)
                            if flagship_shape else samples_per_sec)

    print(json.dumps({
        "metric": "mnist_node_regularized_train_throughput",
        "value": round(samples_per_sec_norm, 2),
        "unit": "samples/sec (batch 512, Tsit5 rtol=1.4e-8, reg on, "
                f"nfe_per_step={int(nfe)}, {MEASURE} steps/dispatch, "
                "NFE-normalized)",
        "vs_baseline": round(
            samples_per_sec_norm / CPU_BASELINE_SAMPLES_PER_SEC, 2),
        "single_dispatch_samples_per_sec": round(single_dispatch_sps, 2),
        "raw_samples_per_sec": round(samples_per_sec, 2),
        "nfe_per_step": int(nfe),
        "nfe_single_dispatch": nfe_single,
        "nfe_pin": {"expected": EXPECTED_FLAGSHIP_NFE,
                    "multi_step_drift": drift,
                    "multi_step_tolerance": NFE_TRIAL_STEP, "ok": nfe_ok},
        "latent_ode_samples_per_sec": round(latent_sps, 2),
        "latent_ode_nfe_per_step": latent_nfe,
        "latent_ode_vs_baseline": round(
            latent_sps / LATENT_CPU_BASELINE_SAMPLES_PER_SEC, 2),
        "tpu_regressions": tpu_reg,
    }))
    if not nfe_ok:
        import sys
        print(f"NFE PIN VIOLATION: flagship nfe single={nfe_single} "
              f"multi={int(nfe)} vs pin {EXPECTED_FLAGSHIP_NFE} "
              f"(multi tolerance +-{NFE_TRIAL_STEP}) — throughput not "
              "comparable to prior rounds", file=sys.stderr)
        sys.exit(1)
    if tpu_reg.get("failed"):
        import sys
        print(f"TPU REGRESSIONS FAILED: {tpu_reg}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
