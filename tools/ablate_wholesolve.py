"""Forward-kernel timing ablations for the flagship whole-solve kernel.

BASELINE.md (round 3) records the monolithic whole-solve gradient step at
~12.1 ms with ~11.6 ms attributed to the FORWARD kernel — far above the
~30 us/step f32-HIGHEST MXU floor. This probe decomposes that forward
cost by timing kernel variants:

  baseline        the shipped forward kernel
  nodma           history stores + async HBM copies removed
  notel           telemetry SMEM stream stores removed
  nodma,notel     both
  precision=...   matmul passes (highest = 6-pass f32, high = 3-pass,
                  default = bf16) via whole_solve_odeint's argument

The nodma/notel variants are selected by REGNDE_WS_ABLATE at import time
(ops.pallas_solve), so each runs as its own subprocess; this script is
ONE leg (env set by the caller) and prints one JSON line. Run all legs:

  for a in "" nodma notel nodma,notel; do
    REGNDE_WS_ABLATE="$a" python - < tools/ablate_wholesolve.py
  done

Timing-only: nodma breaks the backward's history (never set it outside
this probe). Gradient timings are reported only for the baseline leg.
"""
import json
import os
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

from regneuralde_tpu import reg
from regneuralde_tpu.models import MLPDynamics, NeuralODE

B, D, H = 512, 784, 100
RT = 1.4e-8
ABLATE = os.environ.get("REGNDE_WS_ABLATE", "")
PRECISION = os.environ.get("REGNDE_WS_PRECISION", "highest")


def timeit(fn, *args, n=20):
    sync = lambda r: float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    m = MLPDynamics(dim=D, hidden=H)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D)) * 0.5
    p = m.init(key, x, 0.0)

    # fused="solve" forces the monolithic kernel (the routed flagship
    # path); REGNDE_WS_FUSED=tiled probes the batch-tiled variant.
    fused = os.environ.get("REGNDE_WS_FUSED", "solve")
    node = NeuralODE(m, rtol=RT, atol=RT, max_steps=96, fused=fused)
    if PRECISION != "highest":
        # Route around the model layer to pass matmul_precision.
        from regneuralde_tpu.ops.pallas_solve import whole_solve_odeint

        apply_fn, flatten, _bwd, _res = node._whole_solve_parts(p)
        fwd_raw = lambda p, x: whole_solve_odeint(
            node._func, apply_fn, flatten, x, 0.0, 1.0, p,
            rtol=RT, atol=RT, max_steps=96,
            matmul_precision=PRECISION).y1
        fwd = jax.jit(fwd_raw)
    else:
        fwd = jax.jit(lambda p, x: node(p, x, mode="adjoint").value)
    fms = timeit(fwd, p, x)
    nfe = int(jax.jit(lambda p, x: node(p, x, mode="while").nfe)(p, x))
    steps = (nfe - 2) // 6
    out = {"ablate": ABLATE, "precision": PRECISION, "fused": fused,
           "fwd_ms": round(fms, 3), "trial_steps": steps,
           "us_per_step": round(fms / steps * 1e3, 1)}

    if not ABLATE and PRECISION == "highest":
        def loss(p, x):
            o = node(p, x, mode="adjoint")
            return (jnp.mean(o.value ** 2)
                    + 100.0 * reg.error_estimate(o.telemetry, agg="mean"))

        g = jax.jit(jax.grad(loss))
        out["grad_ms"] = round(timeit(g, p, x, n=10), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
