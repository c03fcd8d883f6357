"""Where does the SDE whole-solve kernel win? (VERDICT-r3 #4)

Round 3 landed ops/pallas_sde.py (the ENTIRE adaptive SRI solve as one
Pallas launch per direction) and measured it perf-NEUTRAL at the
reference workloads (~5 trial steps at rtol=1.4e-1: the solve is bound
by Brownian-draw generation and model glue, not per-step launch
overhead). This bench maps fused vs unfused across solve LENGTH — the
sde_toy shape (reference: experiments/sde_toy_problem.jl:45-59; cubic
drift 2->50 tanh->2, diagonal diffusion Dense(2,2), 30 saveat points,
100 trajectories) at successively tighter tolerances, where presampled
draws amortize over 10-100x more trial steps.

Protocol: every variant is built and compiled in ONE process, then
measured round-robin (median over rounds) so tunnel/chip drift cancels
— the same discipline as tools/ablate_interleaved.py. Each timed call
is a full value_and_grad of the sde_toy loss (means/vars L2 + 0.2*sum
reg), synced on the loss.

Output: one JSON line per tolerance with fused/unfused ms, trial steps,
and the speedup; exit 0 always (this is a measurement, not a gate).
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
import flax.linen as nn  # noqa: E402
import numpy as np  # noqa: E402

from regneuralde_tpu import reg  # noqa: E402
from regneuralde_tpu.models import NeuralSDE  # noqa: E402

# The reference uses 100 trajectories; the whole-solve kernel needs an
# 8-aligned batch (Mosaic sublane constraint — a (100, 2) batch FAULTS
# the TPU worker, measured round 4, now guarded in ops.pallas_sde), so
# this bench runs the nearest aligned count.
TRAJ = 128
ROUNDS = 7
INNER = 10
# (rtol=atol, max_steps): the reference tolerance, then 10x and 100x
# tighter — the regimes the whole-solve kernel was built for.
TOLS = [(3e-1, 64), (1.4e-2, 128), (1.4e-3, 512), (1.4e-4, 2048)]


class CubicDrift(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = jnp.tanh(nn.Dense(50)(x**3))
        return nn.Dense(2)(h)


def main():
    saveat = jnp.linspace(0.0, 1.0, 30).astype(jnp.float32)
    u0 = jnp.tile(jnp.asarray([[2.0, 0.0]], jnp.float32), (TRAJ, 1))
    key = jax.random.PRNGKey(5)
    tgt_m = jnp.zeros((30, 2), jnp.float32)
    tgt_v = jnp.ones((30, 2), jnp.float32)

    sync = lambda r: float(np.asarray(jax.tree_util.tree_leaves(r)[0]
                                      ).ravel()[0])

    results = []
    for rt, ms in TOLS:
        fns = {}
        steps = {}
        for name, fused in (("unfused", False), ("fused", True)):
            nsde = NeuralSDE(
                CubicDrift(), nn.Dense(2),
                tspan=(0.0, 1.0 + float(np.finfo(np.float32).eps)),
                solver="sosri", rtol=rt, atol=rt, max_steps=ms,
                saveat=saveat, fused=fused)
            p = nsde.init(jax.random.PRNGKey(5), u0)

            def loss(p, k, nsde=nsde):
                out = nsde(p, u0, k)
                l = (jnp.mean(jnp.square(tgt_m - jnp.mean(out.value, 0)))
                     + jnp.mean(jnp.square(tgt_v - jnp.var(out.value, 0))))
                return l + 0.2 * reg.error_estimate(out.telemetry,
                                                    agg="sum")
            fn = jax.jit(jax.value_and_grad(loss))
            sync(fn(p, key))
            fns[name] = (fn, p)
            st = jax.jit(lambda p, k, nsde=nsde: (
                nsde(p, u0, k).solution.stats.naccept
                + nsde(p, u0, k).solution.stats.nreject))(p, key)
            steps[name] = int(st)
            print(f"compiled rtol={rt} {name} trial_steps={int(st)}",
                  flush=True)

        times = {n: [] for n in fns}
        for _ in range(ROUNDS):
            for n, (fn, p) in fns.items():
                sync(fn(p, key))
                t0 = time.perf_counter()
                for _ in range(INNER):
                    out = fn(p, key)
                sync(out)
                times[n].append((time.perf_counter() - t0) / INNER * 1e3)
        row = {"rtol": rt, "trial_steps": steps["unfused"]}
        for n in fns:
            row[n + "_ms"] = round(float(np.median(times[n])), 3)
            row[n + "_spread"] = round(
                float(np.max(times[n]) - np.min(times[n])), 3)
        row["speedup_fused"] = round(row["unfused_ms"] / row["fused_ms"], 3)
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"workload": "sde_toy shape, fwd+grad", "rows": results}))


if __name__ == "__main__":
    main()
