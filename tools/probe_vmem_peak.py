"""On-device probe: Mosaic-reported VMEM peak of the flagship
whole-solve gradient with the residual-streaming backward enabled.

The module constant `pallas_solve._COMPILER_PARAMS` raises Mosaic's
scoped-VMEM limit to 112MB, justified by a round-4 measured peak of
104.8MB for the hand backward — BEFORE the round-5 no-replay backward
added double-buffered (2, n_ks*B, dpad) + (2, n_h*B, hpad) residual
prefetch blocks (~26MB at the flagship shape) while dropping the
replay's stage temporaries. This probe re-measures the actual peak by
bisecting vmem_limit_bytes: compile the flagship gradient (batch 512 x
dim 784, MLPDynamics, algebra_fwd_res ON) at candidate limits and
record the lowest limit that compiles; Mosaic's RESOURCE_EXHAUSTED
message at the highest failing limit states the requested bytes.

Run from the repo root: `python tools/probe_vmem_peak.py [--coarse]`.
"""
import json
import re
import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

# NOTE: no persistent compile cache here — a cached success at one limit
# would alias another limit's attempt (compiler params are part of the
# kernel, but keep the probe hermetic anyway).
import numpy as np

import regneuralde_tpu.ops.pallas_solve as ps
from jax.experimental import pallas as pl  # noqa: F401
from jax.experimental.pallas import tpu as pltpu
from regneuralde_tpu.models import MLPDynamics, NeuralODE

B, D, H = 512, 784, 100
RT = 1.4e-8


def try_limit(mb: float):
    """Compile + run the flagship gradient at a given scoped-VMEM limit.

    Returns (ok, message): message carries Mosaic's requested-bytes
    text on failure."""
    ps._COMPILER_PARAMS = pltpu.CompilerParams(
        vmem_limit_bytes=int(mb * 2**20))
    m = MLPDynamics(dim=D, hidden=H)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D)) * 0.5
    p = m.init(key, x, 0.0)
    node = NeuralODE(m, rtol=RT, atol=RT, max_steps=96, fused="solve")
    loss = lambda pp: jnp.sum(node(pp, x, mode="adjoint").value ** 2)
    try:
        g = jax.jit(jax.grad(loss))(p)
        float(np.asarray(jax.tree_util.tree_leaves(g)[0]).ravel()[0])
        return True, ""
    except Exception as e:  # noqa: BLE001 - want the compiler text
        return False, str(e)


def main():
    orig = ps._COMPILER_PARAMS
    results = {}
    # Coarse pass: old justification said 104.8MB peak; the no-replay
    # backward swaps ~36MB of replay temporaries for ~26MB of prefetch
    # blocks, so probe downward from 112.
    grid = ([112, 96, 80, 64, 48] if "--coarse" in sys.argv
            else [112, 104, 96, 88, 80, 72, 64, 56, 48, 40])
    lowest_ok, highest_fail, fail_msg = None, None, ""
    for mb in grid:
        ok, msg = try_limit(mb)
        results[str(mb)] = ok
        print(f"limit {mb}MB: {'ok' if ok else 'FAIL'}", flush=True)
        if ok:
            lowest_ok = mb
        else:
            highest_fail, fail_msg = mb, msg
            break  # grid is descending: first failure ends the scan
    ps._COMPILER_PARAMS = orig

    req = None
    mm = re.search(r"(\d[\d,\.]*)\s*(?:bytes|B|KiB|MiB|MB|kB)", fail_msg)
    if mm:
        req = mm.group(0)
    print(json.dumps({
        "backend": jax.default_backend(),
        "shape": [B, D, H], "grid_results": results,
        "lowest_ok_mb": lowest_ok, "highest_fail_mb": highest_fail,
        "mosaic_requested": req,
        "fail_excerpt": fail_msg[:600],
    }))


if __name__ == "__main__":
    main()
