"""Probe: can the flagship whole-solve kernel run its stage-sweep dots at
HIGH (3-pass bf16) instead of HIGHEST (6-pass) without corrupting step
control at rtol=1.4e-8?

Round 4's interleaved ablation attributed ~1.45 ms of the 2.4 ms forward
stage sweep to HIGHEST-precision emulation (BASELINE.md round-4 table) and
showed DEFAULT (1-pass bf16) corrupts EEst at this tolerance. HIGH was
never measured. If the full accept/reject sequence and NFE are unchanged
and the gradient cosine vs the HIGHEST leg is ~1, 3 of the 6 passes are
pure headroom on the forward (the backward measured precision-insensitive,
BASELINE.md round-4: "gradient, default-precision dots | 11.54").

OUTCOME (round 5, 2026-08-21): the probe cannot run — Mosaic's dot
lowering rejects ``Precision.HIGH`` outright (``NotImplementedError:
Unsupported dot precision: HIGH`` from
jax/_src/pallas/mosaic/lowering.py's _dot_general_lowering_rule; only
DEFAULT and HIGHEST lower). A hand-rolled bf16x3 (split each operand
into bf16 hi + bf16 lo, three DEFAULT-precision dots dropping lo*lo)
would carry ~16-17 mantissa bits — but the compensated-EEst study
(BASELINE.md round 5) measured full-f32 (24-bit) stages flooring EEst at
~1.2e-7 relative, so a 17-bit stage sweep would floor step control
orders of magnitude above rtol=1.4e-8. The 6-pass emulation stands as
the cheapest correct option; the forward's 1.45 ms emulation share is
confirmed load-bearing, not headroom. Kept as the record of the attempt.

Runs each leg in a subprocess because ops.pallas_mlp pins _DOT_PRECISION
from REGNDE_DOT_PRECISION at import (probe-only knob, pallas_mlp.py:40-52).

  python tools/probe_precision.py            # orchestrate both legs
  REGNDE_DOT_PRECISION=high python tools/probe_precision.py --leg out.npz
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

B, D, H = 512, 784, 100
RT = 1.4e-8


def run_leg(out_path: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path.home() / ".cache" / "regneuralde_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from regneuralde_tpu import reg
    from regneuralde_tpu.models import MLPDynamics, NeuralODE

    m = MLPDynamics(dim=D, hidden=H)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D)) * 0.5
    p = m.init(key, x, 0.0)
    node = NeuralODE(m, rtol=RT, atol=RT, max_steps=96, fused="solve")

    def loss(p, x):
        o = node(p, x, mode="adjoint")
        return (jnp.mean(o.value ** 2)
                + 100.0 * reg.error_estimate(o.telemetry, agg="mean"),
                (o.nfe, o.telemetry.accepted))

    fwd = jax.jit(lambda p, x: node(p, x, mode="adjoint").value)
    g = jax.jit(jax.value_and_grad(loss, has_aux=True))

    def timeit(fn, n):
        r = fn(p, x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(p, x)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n * 1e3

    fwd_ms = timeit(fwd, 20)
    grad_ms = timeit(g, 10)
    (lv, (nfe, accepted)), grads = g(p, x)
    flat = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(grads)])
    np.savez(out_path,
             loss=np.asarray(lv), nfe=np.asarray(nfe),
             accepted=np.asarray(accepted), grad=np.asarray(flat),
             fwd_ms=fwd_ms, grad_ms=grad_ms)


def orchestrate() -> None:
    import numpy as np

    legs = {}
    for prec in ("highest", "high"):
        out = f"/tmp/prec_leg_{prec}.npz"
        env = dict(os.environ, REGNDE_DOT_PRECISION=prec)
        subprocess.run([sys.executable, __file__, "--leg", out],
                       env=env, check=True, cwd=REPO)
        legs[prec] = np.load(out)
    a, b = legs["highest"], legs["high"]
    cos = float(np.dot(a["grad"], b["grad"])
                / (np.linalg.norm(a["grad"]) * np.linalg.norm(b["grad"])))
    rel = float(np.linalg.norm(a["grad"] - b["grad"])
                / np.linalg.norm(a["grad"]))
    report = {
        "shape": [B, D, H], "rtol": RT,
        "nfe": {"highest": int(a["nfe"]), "high": int(b["nfe"])},
        "accept_pattern_equal": bool((a["accepted"] == b["accepted"]).all()),
        "loss": {"highest": float(a["loss"]), "high": float(b["loss"])},
        "grad_cos": cos, "grad_rel_err": rel,
        "fwd_ms": {"highest": round(float(a["fwd_ms"]), 3),
                   "high": round(float(b["fwd_ms"]), 3)},
        "grad_ms": {"highest": round(float(a["grad_ms"]), 3),
                    "high": round(float(b["grad_ms"]), 3)},
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--leg":
        run_leg(sys.argv[2])
    else:
        orchestrate()
