"""On-device batch sweep of the flagship gradient across the routing
envelope (round 5).

The vmem_estimate recalibration (tools/probe_vmem_peak: measured peak =
46 batch-rows, gate 96MB under the 112MB hard limit) moved the
monolithic/tiled routing boundary: batch 512 x dim 784 stays monolithic
(estimate 80.5MB), while batch 768 — which the OLD 20-row estimate
would have sent monolithic at a true ~126MB peak, a guaranteed Mosaic
compile fault — now routes to the tiled engine. This sweep runs the
full regularized gradient at each batch on the real chip, records which
engine the gate picked, wall ms, and samples/s, and cross-checks the
gradient against the unfused adjoint at every shape.

Run from the repo root: `python tools/sweep_flagship_shapes.py`.
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
import numpy as np  # noqa: E402

from regneuralde_tpu import reg  # noqa: E402
from regneuralde_tpu.models import MLPDynamics, NeuralODE  # noqa: E402
from regneuralde_tpu.ops.pallas_solve import vmem_estimate  # noqa: E402

D, H = 784, 100
RT = 1.4e-8
BATCHES = (128, 256, 512, 768, 1024)
ROUNDS = 5
INNER = 5


def main():
    m = MLPDynamics(dim=D, hidden=H)
    key = jax.random.PRNGKey(0)
    sync = lambda r: float(np.asarray(jax.tree_util.tree_leaves(r)[0]
                                      ).ravel()[0])
    rows = []
    for B in BATCHES:
        x = jax.random.normal(key, (B, D)) * 0.5
        p = m.init(key, x, 0.0)
        node_f = NeuralODE(m, rtol=RT, atol=RT, max_steps=96, fused=True)
        node_u = NeuralODE(m, rtol=RT, atol=RT, max_steps=96, fused=False)

        def loss(pp, node):
            out = node(pp, x, mode="adjoint")
            return (jnp.sum(out.value ** 2) / B
                    + 10.0 * reg.error_estimate(out.telemetry, agg="mean"))

        est_mb = vmem_estimate(B + (-B) % 8, D) / 2**20
        engine = "monolithic" if est_mb <= 96 else "tiled"
        gf = jax.jit(jax.grad(lambda pp: loss(pp, node_f)))
        gu = jax.jit(jax.grad(lambda pp: loss(pp, node_u)))
        sync(gf(p)); sync(gu(p))
        print(f"compiled batch {B} ({engine}, est {est_mb:.1f}MB)",
              flush=True)

        a, b = gf(p), gu(p)
        rel = max(float(jnp.max(jnp.abs(u - v))
                        / (jnp.max(jnp.abs(v)) + 1e-30))
                  for u, v in zip(jax.tree_util.tree_leaves(a),
                                  jax.tree_util.tree_leaves(b)))
        nfe = int(jax.jit(lambda pp: node_u(pp, x, mode="while").nfe)(p))

        t_f, t_u = [], []
        for _ in range(ROUNDS):
            for fn, acc in ((gf, t_f), (gu, t_u)):
                sync(fn(p))
                t0 = time.perf_counter()
                for _ in range(INNER):
                    out = fn(p)
                sync(out)
                acc.append((time.perf_counter() - t0) / INNER * 1e3)
        ms_f = float(np.median(t_f))
        ms_u = float(np.median(t_u))
        rows.append({
            "batch": B, "engine": engine, "est_mb": round(est_mb, 1),
            "nfe": nfe, "fused_ms": round(ms_f, 3),
            "unfused_ms": round(ms_u, 3),
            "fused_samples_per_sec": round(B / ms_f * 1e3, 1),
            "fused_win": round(ms_u / ms_f, 2),
            "grad_rel_err_fused_vs_unfused": rel,
        })
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"backend": jax.default_backend(), "dim": D,
                      "rtol": RT, "rows": rows}))


if __name__ == "__main__":
    main()
