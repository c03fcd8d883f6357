"""Headline benchmark: MNIST Neural-ODE regularized training throughput.

Measures the north-star metric (BASELINE.md): wall-clock training
throughput of the flagship MNIST Neural-ODE classifier with error-estimate
regularization at the reference configuration (batch 512, Tsit5,
rtol=atol=1.4e-8, lambda=1e2, InvDecay+Momentum — reference:
experiments/mnist_node.jl:115-130), running entirely on the accelerator as
one jitted program per step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

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
from regneuralde_tpu.training import TrainState, create_train_state, mnist_node_optimizer

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

    return train_step, create_train_state(params, optimizer), batches


def main():
    import numpy as np

    train_step, state, batches = build()
    for x, y in batches[:WARMUP]:
        state, loss, nfe = train_step(state, x, y)
    float(np.asarray(loss))

    t0 = time.perf_counter()
    for x, y in batches[WARMUP:WARMUP + MEASURE]:
        state, loss, nfe = train_step(state, x, y)
    # Sync via an actual device-to-host read: on the axon backend
    # block_until_ready can return before the async step chain has
    # executed, inflating throughput ~300x. Verified: timing scales
    # linearly in MEASURE with this sync.
    float(np.asarray(loss))
    dt = time.perf_counter() - t0

    samples_per_sec = BATCH * MEASURE / dt
    print(json.dumps({
        "metric": "mnist_node_regularized_train_throughput",
        "value": round(samples_per_sec, 2),
        "unit": "samples/sec (batch 512, Tsit5 rtol=1.4e-8, reg on, "
                f"nfe_per_step={int(nfe)})",
        "vs_baseline": round(samples_per_sec / CPU_BASELINE_SAMPLES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
