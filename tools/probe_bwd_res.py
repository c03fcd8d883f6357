"""Probe: whole-solve backward with vs without stage-residual capture.

The monolithic whole-solve backward kernel previously ran the stage
algebra forward TWICE per reverse step — once in the traced trial-step
vjp (for the primal outputs the controller/Hermite replay needs), once
inside the hand pullback's recompute (ops.pallas_mlp._normed_bwd_math).
``make_normed_algebra_fwd_res`` captures the stage k's and hidden
activations from the traced forward so the pullback skips its recompute.

This probe times fwd and fwd+grad at the flagship shape for both
variants and checks the gradients are bitwise-equal (the residual
forward is op-for-op the same math, so values must not move).

Timing methodology: per-call medians over interleaved rounds, synced on
an in-program scalar (BASELINE.md round-4 methodology — never sync on
the (512,784) output, that adds ~5.8 ms of tunnel transfer).
"""
import sys
import time
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(_P.home() / ".cache" / "regneuralde_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np

from regneuralde_tpu.models import MLPDynamics, NeuralODE
from regneuralde_tpu.ops.pallas_solve import whole_solve_odeint

B, D, H = 512, 784, 100
RT = 1.4e-8

m = MLPDynamics(dim=D, hidden=H)
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, D)) * 0.5
p = m.init(key, x, 0.0)
node = NeuralODE(m, rtol=RT, atol=RT, max_steps=96, fused=True)
apply_fn, flatten, alg_bwd, alg_fwd_res = node._whole_solve_parts(p)


def build(with_res):
    afr = alg_fwd_res if with_res else None

    def run(p, x):
        sol = whole_solve_odeint(
            node._func, apply_fn, flatten, x, 0.0, 1.0, p,
            rtol=RT, atol=RT, max_steps=96,
            algebra_bwd=alg_bwd, algebra_fwd_res=afr)
        tel = sol.telemetry
        reg = jnp.sum(tel.eest * tel.dt * tel.accepted * tel.live) / 96.0
        return jnp.mean(sol.y1 ** 2) + 100.0 * reg

    grad = jax.jit(jax.value_and_grad(run))
    fwd = jax.jit(run)
    return fwd, grad


def timeit(fn, *args, n=20):
    out = fn(*args)
    sync = lambda r: float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    sync(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


fwd_old, grad_old = build(False)
fwd_new, grad_new = build(True)

l_old, g_old = grad_old(p, x)
l_new, g_new = grad_new(p, x)
go = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g_old)])
gn = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g_new)])
rel = float(jnp.linalg.norm(go - gn) / (jnp.linalg.norm(go) + 1e-30))
bitwise = bool(jnp.all(go == gn))
print(f"loss old={float(l_old):.9f} new={float(l_new):.9f}")
print(f"grad relnorm={rel:.3e} bitwise_equal={bitwise}")

print(f"fwd  old  {timeit(fwd_old, p, x):7.3f} ms")
print(f"fwd  new  {timeit(fwd_new, p, x):7.3f} ms")
for rnd in range(3):
    print(f"grad old  {timeit(grad_old, p, x):7.3f} ms   "
          f"grad new  {timeit(grad_new, p, x):7.3f} ms")
