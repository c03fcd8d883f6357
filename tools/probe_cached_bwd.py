"""On-device probe: the no-replay (residual-cached) whole-solve backward.

Round-5 attribution (evidence/r5_backward_attribution) split the
flagship's 6.5 ms backward into loop/carry 0.06 + history DMA 0.35 +
stage-sweep REPLAY 2.37 + hand pullback 3.70 ms (42 steps). The cached
backward streams the forward kernel's stage residuals through HBM and
replaces the replay with pure lincomb recombination. This probe times
full gradients with and without the cache in one process (round-robin,
scalar-synced) and checks the NFE pin + gradient agreement.
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

import regneuralde_tpu.ops.pallas_mlp as pm
from regneuralde_tpu.models import MLPDynamics, NeuralODE

B, D, H = 512, 784, 100
RT = 1.4e-8
ROUNDS = 7
INNER = 10


def main():
    m = MLPDynamics(dim=D, hidden=H)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D)) * 0.5
    p = m.init(key, x, 0.0)
    node = NeuralODE(m, rtol=RT, atol=RT, max_steps=96, fused="solve")
    sync = lambda r: float(np.asarray(jax.tree_util.tree_leaves(r)[0]
                                      ).ravel()[0])

    loss = lambda pp: jnp.sum(node(pp, x, mode="adjoint").value ** 2)
    fns = {}
    _real = pm.make_normed_algebra_fwd_res
    for name, fres in [("grad_cached", _real),
                       ("grad_replay", lambda r, a: None)]:
        pm.make_normed_algebra_fwd_res = fres
        fn = jax.jit(jax.grad(loss))
        sync(fn(p))
        fns[name] = fn
        print("compiled", name, flush=True)
    # forward-only with the cache ON (residual stores) and OFF, same
    # process — isolates the forward's store overhead.
    fwd_c = jax.jit(lambda pp, xx: jnp.sum(node(pp, xx,
                                                mode="adjoint").value))
    sync(fwd_c(p, x))
    fns["fwd"] = lambda q: fwd_c(q, x)
    pm.make_normed_algebra_fwd_res = lambda r, a: None
    node2 = NeuralODE(m, rtol=RT, atol=RT, max_steps=96, fused="solve")
    fwd_n = jax.jit(lambda pp, xx: jnp.sum(node2(pp, xx,
                                                 mode="adjoint").value))
    sync(fwd_n(p, x))
    fns["fwd_nocache"] = lambda q: fwd_n(q, x)
    pm.make_normed_algebra_fwd_res = _real

    nfe = int(jax.jit(lambda pp: node(pp, x, mode="while").nfe)(p))

    # gradient agreement cached vs replay (same step sequence)
    gc = fns["grad_cached"](p)
    gr = fns["grad_replay"](p)
    rel = max(float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
              for a, b in zip(jax.tree_util.tree_leaves(gc),
                              jax.tree_util.tree_leaves(gr)))

    times = {k: [] for k in fns}
    for _ in range(ROUNDS):
        for k, fn in fns.items():
            sync(fn(p))
            t0 = time.perf_counter()
            for _ in range(INNER):
                out = fn(p)
            sync(out)
            times[k].append((time.perf_counter() - t0) / INNER * 1e3)

    med = {k: round(float(np.median(v)), 3) for k, v in times.items()}
    print(json.dumps({
        "backend": jax.default_backend(), "nfe": nfe,
        "trial_steps": (nfe - 2) // 6,
        "grad_rel_err_cached_vs_replay": rel,
        **{k + "_ms": v for k, v in med.items()},
        "fwd_store_overhead_ms": round(med["fwd"] - med["fwd_nocache"], 3),
        "bwd_cached_ms": round(med["grad_cached"] - med["fwd"], 3),
        "bwd_replay_ms": round(med["grad_replay"] - med["fwd_nocache"], 3),
        "grad_speedup": round(med["grad_replay"] / med["grad_cached"], 3),
    }))


if __name__ == "__main__":
    main()
