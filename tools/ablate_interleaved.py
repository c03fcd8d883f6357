"""Interleaved whole-solve forward ablations — one process, drift-robust.

The one-leg-per-process protocol (tools/ablate_wholesolve.py) turned out
to be noise-dominated: identical kernels measured 185 vs 248 us/step in
different processes (tunnel/chip drift), swamping the ~30-50 us effects
under study. This runner builds every variant in ONE process (the ablate
flags, tanh implementation, and dot-precision knob are monkey-patched
between builds — all are read at trace time), compiles them all, then
measures in ROUND-ROBIN: each round times every variant once, and the
per-variant median over rounds cancels slow drift.

Round-3 legs (history DMA, telemetry stores, while-cond sync, dot
precision) each measured <3% of forward time, so round 4 ablates the
TRIAL-STEP COMPUTE itself until >=90% of forward time is attributed:

  base          the shipped forward kernel (while loop, HIGHEST dots)
  fori          counter-driven loop at the true trip count (42)
  f_nattanh     accurate exp-based tanh -> native jnp.tanh
  f_notanh      tanh -> identity (no activation at all)
  f_nolincomb   stage input = y + dt*c*k_prev (one FMA per stage)
  f_stages3     3 dynamics evaluations per step instead of 6
  f_noerr       no embedded-error combination / scalar reductions
  f_noapply     dynamics eval -> 0.999*y_stage (no matmuls, no tanh)
  f_skeleton    noapply+nolincomb+noerr+nodma+notel: loop + controller
  deflt         dot precision lowered to bf16 (DEFAULT)
  grad          full fwd+bwd gradient of the unablated solve (while
                mode) — bwd cost = grad minus base

All f_* legs pin the trip count with fori:42 because wrong math changes
the while-loop's step sequence. Timing-only; gradients are never taken
through ablated programs.
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

import regneuralde_tpu.ops.pallas_generic as pg
import regneuralde_tpu.ops.pallas_mlp as pm
import regneuralde_tpu.ops.pallas_solve as ps
from regneuralde_tpu.models import MLPDynamics, NeuralODE

B, D, H = 512, 784, 100
RT = 1.4e-8
ROUNDS = 7
INNER = 10
FIXED = "fori:42"

# (name, ws_ablate, alg_ablate, precision, tanh, grad)
VARIANTS = [
    ("base", frozenset(), frozenset(), "highest", "accurate", False),
    ("fori", frozenset({FIXED}), frozenset(), "highest", "accurate", False),
    ("f_nattanh", frozenset({FIXED}), frozenset(), "highest", "native",
     False),
    ("f_notanh", frozenset({FIXED}), frozenset(), "highest", "identity",
     False),
    ("f_nolincomb", frozenset({FIXED}), frozenset({"nolincomb"}),
     "highest", "accurate", False),
    ("f_stages3", frozenset({FIXED}), frozenset({"stages:3"}), "highest",
     "accurate", False),
    ("f_noerr", frozenset({FIXED}), frozenset({"noerr"}), "highest",
     "accurate", False),
    ("f_noapply", frozenset({FIXED}), frozenset({"noapply"}), "highest",
     "accurate", False),
    ("f_skeleton", frozenset({FIXED, "nodma", "notel"}),
     frozenset({"noapply", "nolincomb", "noerr"}), "highest", "accurate",
     False),
    ("deflt", frozenset({FIXED}), frozenset(), "default", "accurate",
     False),
    ("grad", frozenset(), frozenset(), "highest", "accurate", True),
    # Backward attribution (timing-only): the backward kernel vjp-traces
    # the same algebra, so these knobs reach it too. bwd share of a leg
    # = (g_* - grad) - (f_* - base).
    ("g_nattanh", frozenset(), frozenset(), "highest", "native", True),
    ("g_deflt", frozenset(), frozenset(), "default", "accurate", True),
    # Round-4 backward-side legs, all fori-pinned (both directions then
    # run exactly 42 steps; ablated math changes values, never counts).
    # bwd share of leg X = (g_X - g_fori) - (f_X - fori).
    ("g_fori", frozenset({FIXED}), frozenset(), "highest", "accurate",
     True),
    ("g_noapply", frozenset({FIXED}), frozenset({"noapply"}), "highest",
     "accurate", True),
    ("g_stages3", frozenset({FIXED}), frozenset({"stages:3"}), "highest",
     "accurate", True),
    ("g_noerr", frozenset({FIXED}), frozenset({"noerr"}), "highest",
     "accurate", True),
    ("g_nolincomb", frozenset({FIXED}), frozenset({"nolincomb"}),
     "highest", "accurate", True),
    # backward-only history-load ablation (gradients garbage; isolates
    # the per-step 3.7MB HBM->VMEM DMA wait in the reverse loop)
    ("g_nobwddma", frozenset({FIXED, "nobwddma"}), frozenset(), "highest",
     "accurate", True),
    # Round-5 backward decomposition (timing-only; gradients garbage).
    # The reverse-step cost splits as: carry/loop (g_bwdskel+nobwddma),
    # + history DMA (g_bwdskel), + 1x stage-sweep replay (g_bwdreplay),
    # + pullback (g_fori - g_bwdreplay).
    ("g_bwdskel", frozenset({FIXED, "bwdskel"}), frozenset(), "highest",
     "accurate", True),
    ("g_bwdskel_nodma", frozenset({FIXED, "bwdskel", "nobwddma"}),
     frozenset(), "highest", "accurate", True),
    ("g_bwdreplay", frozenset({FIXED, "bwdreplay"}), frozenset(),
     "highest", "accurate", True),
    # Structural variants (REAL gradients, different transpose engines):
    # forcetraced is an unknown-math flag — it only flips the
    # `not _ALG_ABLATE` gate in make_whole_solve, so the traced jax.vjp
    # transpose runs instead of the hand chain, math unchanged.
    ("g_traced", frozenset({FIXED}), frozenset({"forcetraced"}),
     "highest", "accurate", True),
    # hand chain WITHOUT the residual-capturing forward (the pullback
    # recomputes its own stage sweep) — patched via NO_FRES below.
    ("g_nofres", frozenset({FIXED}), frozenset(), "highest", "accurate",
     True),
]

NO_FRES = {"g_nofres"}

PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}

_ACCURATE_TANH = pm._tanh
TANH = {
    "accurate": _ACCURATE_TANH,
    "native": jnp.tanh,
    "identity": lambda x: x,
}


def main():
    m = MLPDynamics(dim=D, hidden=H)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D)) * 0.5
    p = m.init(key, x, 0.0)
    node = NeuralODE(m, rtol=RT, atol=RT, max_steps=96, fused="solve")

    sync = lambda r: float(np.asarray(jax.tree_util.tree_leaves(r)[0]
                                      ).ravel()[0])
    fns = {}
    _real_fres = pm.make_normed_algebra_fwd_res
    for name, ws_ab, alg_ab, prec, tanh, grad in VARIANTS:
        ps._ABLATE = ws_ab
        pg._ALG_ABLATE = alg_ab
        pm._DOT_PRECISION = PREC[prec]
        pm._tanh = TANH[tanh]
        pm.make_normed_algebra_fwd_res = (
            (lambda r, a: None) if name in NO_FRES else _real_fres)
        if grad:
            # grad outputs are small (first leaf = a bias vector), so the
            # host sync is cheap.
            fn = jax.jit(jax.grad(
                lambda pp: jnp.sum(node(pp, x, mode="adjoint").value ** 2)))
            sync(fn(p))
            fns[name] = (fn, (p,))
        else:
            # Reduce to a scalar IN-PROGRAM: syncing on the (512, 784)
            # value itself transfers 1.6MB through the tunnel (~6 ms,
            # measured round 4), which swamped every per-leg difference in
            # the round-3 runs of this harness.
            fn = jax.jit(lambda pp, xx: jnp.sum(node(pp, xx,
                                                     mode="adjoint").value))
            sync(fn(p, x))
            fns[name] = (fn, (p, x))
        print(f"compiled {name}", flush=True)
    ps._ABLATE = frozenset()
    pg._ALG_ABLATE = frozenset()
    pm._DOT_PRECISION = PREC["highest"]
    pm._tanh = _ACCURATE_TANH
    pm.make_normed_algebra_fwd_res = _real_fres

    nfe = int(jax.jit(lambda pp, xx: node(pp, xx, mode="while").nfe)(p, x))
    steps = (nfe - 2) // 6

    times = {name: [] for name, *_ in VARIANTS}
    for r in range(ROUNDS):
        for name, *_ in VARIANTS:
            fn, args = fns[name]
            sync(fn(*args))  # re-warm this program on the queue
            t0 = time.perf_counter()
            for _ in range(INNER):
                out = fn(*args)
            sync(out)
            times[name].append((time.perf_counter() - t0) / INNER * 1e3)

    out = {"trial_steps": steps, "fixed_steps": 42, "rounds": ROUNDS}
    for name, ws_ab, *_ in VARIANTS:
        med = float(np.median(times[name]))
        n = 42 if any(a.startswith("fori") for a in ws_ab) else steps
        out[name + "_ms"] = round(med, 3)
        out[name + "_us_per_step"] = round(med / n * 1e3, 1)
        out[name + "_spread"] = round(
            float(np.max(times[name]) - np.min(times[name])), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
