"""One-process fwd-vs-bwd-vs-XLA per-step cost comparison (flagship shape).

The round-3 whole-solve timings implied the backward kernel runs ~4x
faster per trial step than the forward kernel despite ~3x the FLOPs
(BASELINE.md round-3 flagship section). Per-process timings are
drift-dominated on the tunnel, so this measures everything in ONE
process with lax.scan over N=42 in-program iterations per timing, and
round-robins the variants:

  fwd_kernel   scan42 of the step-level fused normed forward kernel
  bwd_kernel   scan42 of the step-level fused backward kernel
  xla_sweep    scan42 of the plain-XLA _reference_normed_sweep
  xla_fwdbwd   scan42 of jax.vjp(trial-step math) in plain XLA — NOTE:
               each iteration re-executes the primal forward AND the
               pullback, so its per-step cost is fwd+bwd; subtract
               xla_sweep's per-step time to estimate the backward-only
               share before comparing against bwd_kernel.

If bwd_kernel ~= fwd_kernel per step, the earlier 52us/step backward
inference was a timing artifact. If bwd is genuinely cheaper, the
forward kernel leaves real time on the table.

Precision note: all contractions in the kernels and in
_reference_normed_sweep carry explicit precision=HIGHEST (see the
"PRECISION IS LOAD-BEARING" comment in ops/pallas_mlp.py), so no
default_matmul_precision context is needed here — and one wrapped
around jit() construction would be a no-op anyway (tracing happens at
first call).
"""
import json
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

from regneuralde_tpu.models import MLPDynamics
from regneuralde_tpu.ops.pallas_mlp import (
    _reference_normed_sweep,
    _split_params,
    mlp_dynamics_normed_sweep,
    mlp_dynamics_normed_sweep_bwd,
)

B, D, H = 512, 784, 100
RT = 1.4e-8
N = 42
ROUNDS = 7
INNER = 8


def main():
    m = MLPDynamics(dim=D, hidden=H)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D)) * 0.5
    p = m.init(key, x, 0.0)
    t0_val = 0.1
    # FSAL seed evaluated at the same t0 the sweeps step from, so the
    # (y, k1) pair is numerically consistent.
    k1 = jax.jit(lambda t, yy, pp: m.apply(pp, yy, t))(
        jnp.float32(t0_val), x, p)
    parts = _split_params(p)
    t0 = jnp.float32(t0_val)
    dt = jnp.float32(0.02)
    cts = (x * 0.1, k1 * 0.1, jnp.float32(1.0), jnp.float32(1.0),
           jnp.float32(1.0))

    def scan_fwd(y, k):
        def body(c, _):
            yy, kk = c
            r = mlp_dynamics_normed_sweep(t0, dt, yy, kk, p, RT, RT)
            return (r.y_new, r.k_last), r.err_ssq
        (yf, _), es = jax.lax.scan(body, (y, k), None, length=N)
        return yf, es

    def scan_bwd(y, k):
        def body(c, _):
            yy, kk = c
            _ct, _cdt, cy, ck, _cp = mlp_dynamics_normed_sweep_bwd(
                t0, dt, yy, kk, p, cts, RT, RT)
            return (cy, ck), jnp.sum(cy[0])
        (yf, _), es = jax.lax.scan(body, (y, k), None, length=N)
        return yf, es

    def scan_xla(y, k):
        def body(c, _):
            yy, kk = c
            yn, kl, e, n, d = _reference_normed_sweep(
                t0, dt, yy, kk, parts, RT, RT)
            return (yn, kl), e
        (yf, _), es = jax.lax.scan(body, (y, k), None, length=N)
        return yf, es

    def scan_xla_vjp(y, k):
        def body(c, _):
            yy, kk = c
            _, vjp = jax.vjp(
                lambda a, b: _reference_normed_sweep(
                    t0, dt, a, b, parts, RT, RT), yy, kk)
            cy, ck = vjp(cts)
            return (cy, ck), jnp.sum(cy[0])
        (yf, _), es = jax.lax.scan(body, (y, k), None, length=N)
        return yf, es

    # Matmul precision is pinned explicitly (HIGHEST) inside every
    # contraction these programs execute (ops/pallas_mlp.py), so no
    # ambient precision context is required — see module docstring.
    fns = {
        "fwd_kernel": jax.jit(scan_fwd),
        "bwd_kernel": jax.jit(scan_bwd),
        "xla_sweep": jax.jit(scan_xla),
        "xla_fwdbwd": jax.jit(scan_xla_vjp),
    }

    sync = lambda r: float(np.asarray(jax.tree_util.tree_leaves(r)[0]
                                      ).ravel()[0])
    for name, fn in fns.items():
        sync(fn(x, k1))
        print(f"compiled {name}", flush=True)

    times = {name: [] for name in fns}
    for r in range(ROUNDS):
        for name, fn in fns.items():
            sync(fn(x, k1))
            ts = time.perf_counter()
            for _ in range(INNER):
                out = fn(x, k1)
            sync(out)
            times[name].append((time.perf_counter() - ts) / INNER * 1e3)

    out = {"steps": N, "rounds": ROUNDS}
    for name in fns:
        med = float(np.median(times[name]))
        out[name + "_ms"] = round(med, 3)
        out[name + "_us_per_step"] = round(med / N * 1e3, 1)
        out[name + "_spread"] = round(
            float(np.max(times[name]) - np.min(times[name])), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
