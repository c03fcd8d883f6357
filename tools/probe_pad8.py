"""On-device probe: padded misaligned batches through the whole-solve kernels.

Round-4 finding: Mosaic FAULTS the TPU worker on whole-solve VMEM refs
whose batch is not a multiple of 8 (measured at (100, 2) — the
reference's literal sde_toy trajectory count,
/root/reference/experiments/sde_toy_problem.jl:61-76). Round 5 pads such
batches with masked rows inside the wrappers. This probe runs the padded
path ON THE TPU (the CPU suite runs the same code in interpret mode) and
checks value/NFE parity vs the unfused engines, then times the sde_toy
shape fused vs unfused so BASELINE.md's "fused win at 100 trajectories"
line is measured, not asserted.
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

from regneuralde_tpu.models import MLP
from regneuralde_tpu.ops.pallas_sde import whole_solve_sdeint
from regneuralde_tpu.ops.sde import sdeint

ROUNDS = 5
INNER = 20


def _time(fn, *args):
    fn(*args)  # compile + warm
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(INNER):
            out = fn(*args)
        float(np.asarray(out))  # device->host scalar sync
        best = min(best, (time.perf_counter() - t0) / INNER)
    return best * 1e3


def main():
    # sde_toy's literal shape: 100 trajectories, dim 2, x^3 drift MLP.
    drift_m = MLP(features=(50, 2))
    diff_m = MLP(features=(2,))
    y = jax.random.normal(jax.random.PRNGKey(7), (100, 2)) * 0.4
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    p = {"d": drift_m.init(k1, y**3), "g": diff_m.init(k2, y)}
    drift = lambda t, yy, pp: drift_m.apply(pp["d"], yy**3)
    diffusion = lambda t, yy, pp: 0.2 * diff_m.apply(pp["g"], yy)
    key = jax.random.PRNGKey(3)
    kw = dict(key=key, solver="sosri", rtol=3e-1, atol=3e-1, max_steps=64)

    def fused_loss(p):
        s = whole_solve_sdeint(drift, diffusion, y, 0.0, 1.0, p, **kw)
        return jnp.sum(s.y1**2), (s.stats.naccept, s.stats.nreject)

    def unfused_loss(p):
        s = sdeint(drift, diffusion, y, 0.0, 1.0, p, mode="adjoint", **kw)
        return jnp.sum(s.y1**2), (s.stats.naccept, s.stats.nreject)

    vf, (naf, nrf) = jax.jit(fused_loss)(p)
    vu, (nau, nru) = jax.jit(unfused_loss)(p)
    parity = {
        "value_fused": float(vf), "value_unfused": float(vu),
        "naccept": [int(naf), int(nau)], "nreject": [int(nrf), int(nru)],
        "value_rel_err": abs(float(vf) - float(vu)) / abs(float(vu)),
    }
    print("parity:", json.dumps(parity))
    assert int(naf) == int(nau) and int(nrf) == int(nru), parity
    assert parity["value_rel_err"] < 1e-4, parity

    # gradient parity
    gf = jax.jit(jax.grad(lambda p: fused_loss(p)[0]))(p)
    gu = jax.jit(jax.grad(lambda p: unfused_loss(p)[0]))(p)
    errs = [float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
            for a, b in zip(jax.tree_util.tree_leaves(gf),
                            jax.tree_util.tree_leaves(gu))]
    print("grad rel errs:", [f"{e:.2e}" for e in errs])
    assert max(errs) < 5e-3, errs

    # timing: fused vs unfused full gradient at the sde_toy shape
    from jax.flatten_util import ravel_pytree

    gf_t = jax.jit(lambda p: jnp.sum(jnp.abs(ravel_pytree(
        jax.grad(lambda q: fused_loss(q)[0])(p))[0])))
    gu_t = jax.jit(lambda p: jnp.sum(jnp.abs(ravel_pytree(
        jax.grad(lambda q: unfused_loss(q)[0])(p))[0])))
    tf = _time(gf_t, p)
    tu = _time(gu_t, p)

    # The fused win grows with trial-step count (round 4: 1.8-5.1x past
    # ~20 steps). sde_toy's literal 3e-1 tolerance takes ~3 steps; also
    # time a tight-tolerance leg at the same 100-row shape to show the
    # padded batch keeps the win where the steps are many.
    kwt = dict(kw, rtol=1e-3, atol=1e-3, max_steps=96)

    def fused_tight(p):
        s = whole_solve_sdeint(drift, diffusion, y, 0.0, 1.0, p, **kwt)
        return jnp.sum(s.y1**2), s.stats.naccept + s.stats.nreject

    def unfused_tight(p):
        s = sdeint(drift, diffusion, y, 0.0, 1.0, p, mode="adjoint", **kwt)
        return jnp.sum(s.y1**2), s.stats.naccept + s.stats.nreject

    nsteps_tight = int(jax.jit(fused_tight)(p)[1])
    gft = jax.jit(lambda p: jnp.sum(jnp.abs(ravel_pytree(
        jax.grad(lambda q: fused_tight(q)[0])(p))[0])))
    gut = jax.jit(lambda p: jnp.sum(jnp.abs(ravel_pytree(
        jax.grad(lambda q: unfused_tight(q)[0])(p))[0])))
    tft = _time(gft, p)
    tut = _time(gut, p)

    print(json.dumps({
        "backend": jax.default_backend(),
        "fused_grad_ms": round(tf, 3),
        "unfused_grad_ms": round(tu, 3),
        "fused_speedup": round(tu / tf, 2),
        "tight_nsteps": nsteps_tight,
        "tight_fused_grad_ms": round(tft, 3),
        "tight_unfused_grad_ms": round(tut, 3),
        "tight_fused_speedup": round(tut / tft, 2),
        **parity,
    }))


if __name__ == "__main__":
    main()
