"""Micro-profile of the flagship (MNIST-NODE) fused kernels + adjoint loop."""
import sys, time
from pathlib import Path as _P
sys.path.insert(0, str(_P(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", str(_P.home() / ".cache" / "regneuralde_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np
from regneuralde_tpu import reg
from regneuralde_tpu.models import MLPDynamics, NeuralODE
from regneuralde_tpu.ops.pallas_mlp import (
    mlp_dynamics_normed_sweep, mlp_dynamics_normed_sweep_bwd, _split_params)

B, D, H = 512, 784, 100
RT = 1.4e-8
m = MLPDynamics(dim=D, hidden=H)
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, D)) * 0.5
p = m.init(key, x, 0.0)
f = lambda t, yy, pp: m.apply(pp, yy, t)
k1 = jax.jit(f)(jnp.float32(0.0), x, p)

def timeit(fn, *args, n=30):
    # Sync via a device-to-host read: on the axon backend
    # block_until_ready can return before the async chain executes.
    sync = lambda r: float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    r = fn(*args); sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / n * 1e3

with jax.default_matmul_precision("highest"):
    fwd = jax.jit(lambda t, dt, y, k1, p: tuple(
        mlp_dynamics_normed_sweep(t, dt, y, k1, p, RT, RT)))
    print("fwd kernel     %.3f ms" % timeit(fwd, jnp.float32(0.1), jnp.float32(0.03), x, k1, p))
    cts = (x * 0.1, k1 * 0.1, jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0))
    bwd = jax.jit(lambda t, dt, y, k1, p, cts: mlp_dynamics_normed_sweep_bwd(
        t, dt, y, k1, p, cts, RT, RT))
    print("bwd kernel     %.3f ms" % timeit(bwd, jnp.float32(0.1), jnp.float32(0.03), x, k1, p, cts))

node = NeuralODE(m, rtol=RT, atol=RT, max_steps=96, fused=True)
pn = p
adj_f = jax.jit(lambda p, x: node(p, x, mode="adjoint").value)
print("solve fwd adj  %.3f ms" % timeit(adj_f, pn, x, n=10))
whl = jax.jit(lambda p, x: node(p, x, mode="while").value)
print("solve fwd whl  %.3f ms" % timeit(whl, pn, x, n=10))
def loss(p, x):
    out = node(p, x, mode="adjoint")
    r = reg.error_estimate(out.telemetry, agg="mean")
    return jnp.mean(out.value ** 2) + 100.0 * r
g = jax.jit(jax.grad(loss))
print("solve grad     %.3f ms" % timeit(g, pn, x, n=10))
n = jax.jit(lambda p, x: node(p, x, mode="while").nfe)(pn, x)
print("nfe =", int(n), "trial steps =", (int(n) - 2) // 6)

# --- isolate per-iteration cost: scan of bare fused kernels, no controller ---
def scan_kernels(t, dt, y, k1, p, n=42):
    def body(c, _):
        yy, kk = c
        with jax.default_matmul_precision("highest"):
            res = mlp_dynamics_normed_sweep(t, dt, yy, kk, p, RT, RT)
        return (res.y_new, res.k_last), res.err_ssq
    (yf, kf), es = jax.lax.scan(body, (y, k1), None, length=n)
    return yf, es

sk = jax.jit(lambda t, dt, y, k1, p: scan_kernels(t, dt, y, k1, p))
ms = timeit(sk, jnp.float32(0.0), jnp.float32(0.02), x, k1, p, n=10)
print("scan42 fwd kernels  %.3f ms  (%.1f us/kernel)" % (ms, ms / 42 * 1e3))

# same with the full generic XLA sweep for comparison
from regneuralde_tpu.ops.ode import odeint as _oi
node_nf = NeuralODE(m, rtol=RT, atol=RT, max_steps=96, fused=False)
wh = jax.jit(lambda p, x: node_nf(p, x, mode="while").value)
print("solve fwd whl nofuse %.3f ms" % timeit(wh, p, x, n=5))
