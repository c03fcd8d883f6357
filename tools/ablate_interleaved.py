"""Interleaved whole-solve forward ablations — one process, drift-robust.

The one-leg-per-process protocol (tools/ablate_wholesolve.py) turned out
to be noise-dominated: identical kernels measured 185 vs 248 us/step in
different processes (tunnel/chip drift), swamping the ~30-50 us effects
under study. This runner builds every variant in ONE process (the ablate
flag and the dot-precision knob are monkey-patched between builds — both
are read at trace time), compiles them all, then measures in ROUND-ROBIN:
each round times every variant once, and the per-variant median over
rounds cancels slow drift. Differences between variants within a round
share the same chip state.

Variants:
  base          the shipped forward kernel (HIGHEST dots)
  nodma         history stores + async HBM copies removed
  notel         telemetry stream stores removed
  none          both removed (compute + controller only)
  high / deflt  dot precision lowered (3-pass / bf16) via
                REGNDE_DOT_PRECISION's module knob

Timing-only (nodma breaks the backward); gradients are never taken here.
"""
import json
import time
from pathlib import Path as _P

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(_P.home() / ".cache" / "regneuralde_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np

import regneuralde_tpu.ops.pallas_mlp as pm
import regneuralde_tpu.ops.pallas_solve as ps
from regneuralde_tpu.models import MLPDynamics, NeuralODE

B, D, H = 512, 784, 100
RT = 1.4e-8
ROUNDS = 7
INNER = 10

VARIANTS = [
    ("base", frozenset(), "highest"),
    ("nodma", frozenset({"nodma"}), "highest"),
    ("notel", frozenset({"notel"}), "highest"),
    ("none", frozenset({"nodma", "notel"}), "highest"),
    # Precision.HIGH does not lower in Mosaic ("Unsupported dot
    # precision"); only the bf16 DEFAULT is probed against HIGHEST.
    ("deflt", frozenset(), "default"),
    # Counter-driven loop at the true trip count (42 at this shape/seed):
    # isolates the per-step done-flag vector->scalar sync of the while
    # cond, the one structural difference from the backward's fori walk.
    ("fori", frozenset({"fori:42"}), "highest"),
    ("fori_none", frozenset({"fori:42", "nodma", "notel"}), "highest"),
]

PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def main():
    m = MLPDynamics(dim=D, hidden=H)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D)) * 0.5
    p = m.init(key, x, 0.0)
    node = NeuralODE(m, rtol=RT, atol=RT, max_steps=96, fused="solve")

    sync = lambda r: float(np.asarray(r).ravel()[0])
    fns = {}
    for name, ablate, prec in VARIANTS:
        ps._ABLATE = ablate
        pm._DOT_PRECISION = PREC[prec]
        fn = jax.jit(lambda pp, xx, _n=name: node(pp, xx,
                                                  mode="adjoint").value)
        sync(fn(p, x))  # compile now, under the patched knobs
        fns[name] = fn
        print(f"compiled {name}", flush=True)
    ps._ABLATE = frozenset()
    pm._DOT_PRECISION = PREC["highest"]

    nfe = int(jax.jit(lambda pp, xx: node(pp, xx, mode="while").nfe)(p, x))
    steps = (nfe - 2) // 6

    times = {name: [] for name, _, _ in VARIANTS}
    for r in range(ROUNDS):
        for name, _, _ in VARIANTS:
            fn = fns[name]
            sync(fn(p, x))  # re-warm this program on the queue
            t0 = time.perf_counter()
            for _ in range(INNER):
                out = fn(p, x)
            sync(out)
            times[name].append((time.perf_counter() - t0) / INNER * 1e3)

    out = {"trial_steps": steps, "rounds": ROUNDS}
    for name, _, _ in VARIANTS:
        med = float(np.median(times[name]))
        out[name + "_ms"] = round(med, 3)
        out[name + "_us_per_step"] = round(med / steps * 1e3, 1)
        out[name + "_spread"] = round(
            float(np.max(times[name]) - np.min(times[name])), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
