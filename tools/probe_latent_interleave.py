"""Latent-floor algorithmic lever probe (VERDICT-r3 #8).

Round 3 established the latent-ODE whole-solve floor: each trial step is
24 sequentially DEPENDENT tiny MXU contractions ((256x20)@(20x50) then
(256x50)@(50x50) alternating, HIGHEST precision) whose measured ~1 us
each is MXU pipeline latency, not bandwidth. The proposed lever:
interleave two INDEPENDENT half-batch solves so chain B's stage-k dot
issues into chain A's dependency stall, halving wall time for the same
total batch.

This probe measures the lever's ceiling WITHOUT rebuilding the solver:
the same dependent-contraction chain structure (S steps x 24 dots),
jitted three ways at total batch 256:

  single   one 256-row chain (the shipped schedule)
  dual     two independent 128-row chains, ops interleaved in program
           order (what an interleave=2 whole-solve kernel would do)
  half     one 128-row chain alone (lower bound: if 256 costs the same
           as 128, the machine is pure-latency-bound and dual's ceiling
           is 2x)

If dual ~= single, XLA/Mosaic cannot overlap the chains and the lever is
dead (record the negative, VERDICT #8 allows it). If dual ~= half, the
lever is worth an interleave=2 kernel variant.

Runs on the real chip; interleaved round-robin medians.
"""
import json
import sys
import time
from functools import partial
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(_P.home() / ".cache" / "regneuralde_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np  # noqa: E402

B = 256
LAT, HID = 20, 50
STEPS = 85            # latent trial-step count at the round-3 shape
DOTS = 12             # 6 stages x 2 layers worth of dependent dots per step
ROUNDS = 9
INNER = 20
P = jax.lax.Precision.HIGHEST


def chain_step(y, ws):
    """One trial step: DOTS dependent contractions 20->50->20->...."""
    w_up, w_dn = ws
    h = y
    for _ in range(DOTS // 2):
        h = jnp.tanh(jnp.dot(h, w_up, precision=P))       # (b,20)@(20,50)
        h = jnp.dot(h, w_dn, precision=P)                 # (b,50)@(50,20)
    return h


def make_single(b):
    def run(y, ws):
        def body(y, _):
            return chain_step(y, ws), None
        y, _ = jax.lax.scan(body, y, None, length=STEPS)
        return jnp.sum(y)
    return jax.jit(run)


def make_dual():
    def run(ya, yb, ws):
        def body(carry, _):
            ya, yb = carry
            # interleave the two independent chains dot-by-dot so each
            # issues into the other's dependency stall
            w_up, w_dn = ws
            ha, hb = ya, yb
            for _ in range(DOTS // 2):
                ha = jnp.dot(ha, w_up, precision=P)
                hb = jnp.dot(hb, w_up, precision=P)
                ha = jnp.tanh(ha)
                hb = jnp.tanh(hb)
                ha = jnp.dot(ha, w_dn, precision=P)
                hb = jnp.dot(hb, w_dn, precision=P)
            return (ha, hb), None
        (ya, yb), _ = jax.lax.scan(body, (ya, yb), None, length=STEPS)
        return jnp.sum(ya) + jnp.sum(yb)
    return jax.jit(run)


def main():
    key = jax.random.PRNGKey(0)
    y = jax.random.normal(key, (B, LAT)) * 0.1
    ws = (jax.random.normal(key, (LAT, HID)) * 0.1,
          jax.random.normal(key, (HID, LAT)) * 0.1)

    # Instantiate each jitted program ONCE (a fresh jax.jit per call
    # would retrace+recompile inside the timed region).
    f_single = make_single(B)
    f_dual = make_dual()
    f_half = make_single(B // 2)
    fns = {
        "single_256": lambda: f_single(y, ws),
        "dual_2x128": lambda: f_dual(y[:B // 2], y[B // 2:], ws),
        "half_128": lambda: f_half(y[:B // 2], ws),
    }
    # compile
    for n, f in fns.items():
        float(np.asarray(f()))
        print("compiled", n, flush=True)

    times = {n: [] for n in fns}
    for _ in range(ROUNDS):
        for n, f in fns.items():
            float(np.asarray(f()))
            t0 = time.perf_counter()
            for _ in range(INNER):
                r = f()
            float(np.asarray(r))
            times[n].append((time.perf_counter() - t0) / INNER * 1e3)

    out = {"steps": STEPS, "dots_per_step": DOTS, "batch": B}
    for n in fns:
        out[n + "_ms"] = round(float(np.median(times[n])), 3)
        out[n + "_spread"] = round(
            float(np.max(times[n]) - np.min(times[n])), 3)
    out["dual_vs_single"] = round(
        out["single_256_ms"] / out["dual_2x128_ms"], 3)
    out["single_vs_half"] = round(
        out["single_256_ms"] / out["half_128_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
