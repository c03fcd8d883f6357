"""Per-component profile of the latent-ODE train step on the TPU."""
import sys, time, functools
from pathlib import Path as _P
sys.path.insert(0, str(_P(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
from pathlib import Path
jax.config.update("jax_compilation_cache_dir", str(Path.home() / ".cache" / "regneuralde_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np
import optax
import flax.linen as nn
from regneuralde_tpu import reg
from regneuralde_tpu.data import load_physionet
from regneuralde_tpu.models import (MLP, AlternatingMLP, LatentGRU, LatentTimeSeriesModel, NeuralODE)

B = 256; MS = 256
train_loader, _ = load_physionet(B, seed=0)
batches = []
for b in train_loader:
    if b[0].shape[0] == B:
        batches.append(tuple(jnp.asarray(a) for a in b[:6]))
    if len(batches) >= 3: break
d0, m0, _, _, tp0, _ = batches[0]
saveat = jnp.sort(tp0[0])

node = NeuralODE(AlternatingMLP(dim=20, hidden=50, depth=4), time_dep=False,
                 solver="tsit5", rtol=1.4e-8, atol=1.4e-8, max_steps=MS,
                 saveat=saveat, fused=True)
model = LatentTimeSeriesModel(
    rnn=LatentGRU(in_dim=37, hidden=40, latent_dim=50),
    enc=MLP(features=(50, 2*20)), node=node, dec=nn.Dense(37))

def inputs(d, m, tp):
    dt = jnp.concatenate([tp[:, 1:] - tp[:, :-1], jnp.zeros_like(tp[:, :1])], 1)
    return jnp.concatenate([d, m, dt[..., None]], axis=-1)

params = model.init(jax.random.PRNGKey(3), inputs(d0, m0, tp0))
key = jax.random.PRNGKey(9)

def timeit(fn, *args, n=10):
    # Sync via a device-to-host read: on the axon backend
    # block_until_ready can return before the async chain executes.
    sync = lambda r: float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    r = fn(*args); sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / n * 1e3

x = inputs(d0, m0, tp0)

# 1. GRU encoder fwd
gru_fwd = jax.jit(lambda p, x: model.rnn.apply(p["rnn"], x))
print("gru fwd        %.2f ms" % timeit(gru_fwd, params, x))
# 2. GRU encoder grad
gru_grad = jax.jit(jax.grad(lambda p, x: jnp.sum(model.rnn.apply(p["rnn"], x) ** 2)))
print("gru fwd+bwd    %.2f ms" % timeit(gru_grad, params, x))

# 3. ODE solve alone (fwd while / fwd adjoint / grad adjoint / grad scan)
z0 = jax.random.normal(key, (B, 20)) * 0.3
ode_while = jax.jit(lambda p, z: node(p["de"], z, mode="while").value)
print("ode fwd while  %.2f ms" % timeit(ode_while, params, z0))
ode_adj_f = jax.jit(lambda p, z: node(p["de"], z, mode="adjoint").value)
print("ode fwd adj    %.2f ms" % timeit(ode_adj_f, params, z0))
def ode_loss(p, z, mode):
    out = node(p["de"], z, mode=mode)
    r = reg.error_estimate(out.telemetry, agg="mean")
    return jnp.sum(out.value ** 2) * 1e-3 + 1e3 * r
ode_adj_g = jax.jit(lambda p, z: jax.grad(ode_loss)(p, z, "adjoint"))
print("ode grad adj   %.2f ms" % timeit(ode_adj_g, params, z0))

# nfe in this regime
sol = jax.jit(lambda p, z: node(p["de"], z, mode="while").nfe)(params, z0)
print("nfe(init params) =", int(sol))

# 4. full train step
from regneuralde_tpu.training import TrainState, create_train_state, latent_ode_optimizer
optimizer = latent_ode_optimizer()
sigma = 0.01
def loss_fn(params, d, m, tp, key):
    out = model(params, inputs(d, m, tp), key, saveat=saveat)
    err = (out.result - d) * m
    ll = jnp.sum(-jnp.square(err) / (2 * sigma**2), axis=(1, 2))
    ll = ll / jnp.maximum(jnp.sum(m, axis=(1, 2)), 1.0)
    kl = jnp.mean(jnp.exp(out.logvar) + jnp.square(out.mu0) - 1 - out.logvar, axis=-1) / 2
    r = reg.error_estimate(out.telemetry, agg="mean")
    return -jnp.mean(ll - kl) + 1e3 * r, out.nfe
opt = optimizer
@functools.partial(jax.jit)
def train_step(state, d, m, tp, key):
    (loss, nfe), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, d, m, tp, key)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    p = optax.apply_updates(state.params, updates)
    return TrainState(p, opt_state, state.step + 1), loss, nfe
state = create_train_state(params, optimizer)
k = jax.random.PRNGKey(1)
def full(state):
    s, l, n = train_step(state, d0, m0, tp0, k)
    return l
print("full step      %.2f ms" % timeit(full, state))
# full fwd only
fwd_only = jax.jit(lambda p: loss_fn(p, d0, m0, tp0, k)[0])
print("full fwd only  %.2f ms" % timeit(fwd_only, params))
