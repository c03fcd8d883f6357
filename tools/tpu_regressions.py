"""On-device regression checks that the CPU test mesh cannot cover.

The CI suite runs on a virtual CPU mesh where TPU-only failure modes
(bf16 default matmuls poisoning custom-vjp backwards) are invisible —
`tests/test_adjoint.py::test_adjoint_grads_survive_accelerator_precision`
is skipped there. This script runs those checks on the real chip and
prints one PASS/FAIL line each; run it whenever the adjoint engines or
kernel precision handling change:

    python tools/tpu_regressions.py
"""
import sys
from pathlib import Path as _P
sys.path.insert(0, str(_P(__file__).resolve().parent.parent))
import jax
jax.config.update("jax_compilation_cache_dir",
                  str(_P.home() / ".cache" / "regneuralde_tpu_xla"))
import jax.numpy as jnp
import numpy as np

from regneuralde_tpu.ops import odeint

failures = 0
passes = 0


def check(name, fn):
    global failures, passes
    try:
        fn()
        passes += 1
        print(f"PASS {name}")
    except Exception as e:  # noqa: BLE001 - report-and-continue runner
        failures += 1
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")


def adjoint_precision():
    """tests/test_adjoint.py::test_adjoint_grads_survive_accelerator_precision
    — the bf16-default backward poisoning regression, TPU-only."""
    A = jax.random.normal(jax.random.PRNGKey(0), (8, 8)) * 0.3
    y0 = jnp.ones((4, 8))

    def f(t, y, args):
        (A,) = args
        return jnp.tanh(y @ A)

    def loss(args, mode):
        sol = odeint(f, y0, 0.0, 1.0, args, rtol=1e-5, atol=1e-5,
                     max_steps=64, mode=mode)
        return jnp.sum(sol.y1 ** 2)

    ga = jax.jit(jax.grad(lambda a: loss(a, "adjoint")))((A,))
    gs = jax.jit(jax.grad(lambda a: loss(a, "scan")))((A,))
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gs[0]),
                               rtol=1e-3, atol=1e-5)


def whole_solve_grads():
    """Whole-solve kernel gradients vs the scan oracle, on-device (the
    CPU suite runs these in interpret mode; this is the compiled check)."""
    from regneuralde_tpu.models import AlternatingMLP, NeuralODE
    from regneuralde_tpu import reg

    m = AlternatingMLP(dim=8, hidden=10, depth=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 8)) * 0.4
    sa = jnp.asarray([0.0, 0.5, 1.0])
    node = NeuralODE(m, time_dep=False, rtol=1e-4, atol=1e-4,
                     max_steps=64, saveat=sa, fused="solve")

    p = node.init(jax.random.PRNGKey(1), x)

    def loss(p, mode):
        out = node(p, x, mode=mode)
        return (jnp.sum(out.value ** 2)
                + 10.0 * reg.error_estimate(out.telemetry, agg="mean"))

    ga = jax.jit(jax.grad(lambda p: loss(p, "adjoint")))(p)
    gs = jax.jit(jax.grad(lambda p: loss(p, "scan")))(p)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-4)


def sde_whole_solve_grads():
    """Fused SDE whole-solve kernel (saveat path incl. the save cursor)
    vs the unfused adjoint engine: same presampled draws -> gradients
    must match on-device."""
    from regneuralde_tpu.models import MLP, NeuralSDE

    drift = MLP(features=(16, 8))
    diff = MLP(features=(8,))
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 8)) * 0.4
    sa = jnp.asarray([0.0, 0.4, 1.0])
    kwargs = dict(solver="sosri", rtol=1.4e-1, atol=1.4e-1, max_steps=64,
                  saveat=sa)
    nsde_f = NeuralSDE(drift, diff, fused=True, **kwargs)
    nsde_u = NeuralSDE(drift, diff, fused=False, **kwargs)
    p = nsde_f.init(jax.random.PRNGKey(3), x)
    key = jax.random.PRNGKey(7)

    def loss(model, p):
        out = model(p, x, key)
        return jnp.sum(out.value ** 2)

    gf = jax.jit(jax.grad(lambda p: loss(nsde_f, p)))(p)
    gu = jax.jit(jax.grad(lambda p: loss(nsde_u, p)))(p)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-4)


def cached_backward_bitwise():
    """The round-5 no-replay (residual-cached) whole-solve backward must
    produce the SAME gradient floats as the replay backward on-device
    (measured bitwise-equal, tools/probe_cached_bwd.py) and the padded
    misaligned-batch path must match the unfused engine — both
    MLPDynamics hand-chain behaviors the CPU interpret suite can only
    check loosely."""
    import regneuralde_tpu.ops.pallas_mlp as pm
    from regneuralde_tpu.models import MLPDynamics, NeuralODE

    m = MLPDynamics(dim=16, hidden=12)
    x = jax.random.normal(jax.random.PRNGKey(4), (64, 16)) * 0.4
    node = NeuralODE(m, rtol=1e-5, atol=1e-5, max_steps=64, fused="solve")
    p = node.init(jax.random.PRNGKey(5), x)
    loss = lambda pp: jnp.sum(node(pp, x, mode="adjoint").value ** 2)

    g_cached = jax.jit(jax.grad(loss))(p)
    real = pm.make_normed_algebra_fwd_res
    try:
        pm.make_normed_algebra_fwd_res = lambda r, a: None
        node2 = NeuralODE(m, rtol=1e-5, atol=1e-5, max_steps=64,
                          fused="solve")
        g_replay = jax.jit(jax.grad(
            lambda pp: jnp.sum(node2(pp, x, mode="adjoint").value ** 2)))(p)
    finally:
        pm.make_normed_algebra_fwd_res = real
    for a, b in zip(jax.tree_util.tree_leaves(g_cached),
                    jax.tree_util.tree_leaves(g_replay)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def per_sample_on_device():
    """Per-sample mode on the real chip: lane-vs-lone bitwise parity and
    adjoint/scan gradient agreement must survive compiled (non-interpret)
    execution and the TPU's matmul-precision handling."""
    from regneuralde_tpu.ops import odeint_per_sample

    A = jax.random.normal(jax.random.PRNGKey(4), (8, 8)) * 0.3

    def f(t, y, args):
        (A,) = args
        return jnp.tanh(y @ A)

    y0 = jnp.stack([jnp.ones(8), 2 * jnp.ones(8), -0.5 * jnp.ones(8)])
    kw = dict(rtol=1e-5, atol=1e-5, max_steps=64)
    sol = jax.jit(lambda y: odeint_per_sample(f, y, 0.0, 1.0, (A,),
                                              mode="while", **kw))(y0)
    for i in range(3):
        si = jax.jit(lambda y: odeint(f, y, 0.0, 1.0, (A,), mode="while",
                                      **kw))(y0[i : i + 1])
        # Bitwise lane-vs-lone parity is pinned on the CPU suite
        # (tests/test_per_sample.py) where both sides lower identically.
        # On the chip XLA lowers the vmap'd batch and the lone (1,8)
        # solve to different fusions, so values agree only to f32
        # roundoff (measured ~1e-5 rel); step counts must still be
        # IDENTICAL (the controllers see the same accept/reject chain).
        assert int(sol.stats.nfe[i]) == int(si.stats.nfe), (
            f"lane {i}: nfe {int(sol.stats.nfe[i])} != {int(si.stats.nfe)}")
        np.testing.assert_allclose(np.asarray(sol.y1[i]),
                                   np.asarray(si.y1[0]),
                                   rtol=5e-5, atol=1e-6)

    def loss(args, mode):
        s = odeint_per_sample(f, y0, 0.0, 1.0, args, mode=mode, **kw)
        return jnp.sum(s.y1 ** 2)

    ga = jax.jit(jax.grad(lambda a: loss(a, "adjoint")))((A,))
    gs = jax.jit(jax.grad(lambda a: loss(a, "scan")))((A,))
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gs[0]),
                               rtol=1e-3, atol=1e-5)


def per_sample_batched_on_device():
    """The per-lane-controller batched engine on the real chip: per-lane
    step counts must track the vmap engine within ONE trial step and
    values/gradients must agree. Guards the bf16-EEst failure class:
    without the engine's baked matmul_precision, TPU-default dots flood
    the per-lane error estimate and EVERY lane caps out (measured round
    4: per-lane NFE 578 == the cap at the flagship tolerance, invisible
    on the CPU suite)."""
    from regneuralde_tpu.ops import odeint_per_sample

    A = jax.random.normal(jax.random.PRNGKey(4), (8, 8)) * 0.3

    def f(t, y, args):
        (A,) = args
        return jnp.tanh(y @ A)

    y0 = jnp.stack([jnp.ones(8), 2 * jnp.ones(8), -0.5 * jnp.ones(8)])
    kw = dict(rtol=1e-6, atol=1e-6, max_steps=64)
    sv = jax.jit(lambda y: odeint_per_sample(f, y, 0.0, 1.0, (A,),
                                             mode="while", **kw))(y0)
    sb = jax.jit(lambda y: odeint_per_sample(f, y, 0.0, 1.0, (A,),
                                             engine="batched", **kw))(y0)
    assert bool(np.asarray(sb.stats.success).all()), "batched lanes capped"
    dn = np.abs(np.asarray(sv.stats.nfe) - np.asarray(sb.stats.nfe))
    assert (dn <= 6).all(), (
        f"per-lane NFE drift vmap={np.asarray(sv.stats.nfe)} "
        f"batched={np.asarray(sb.stats.nfe)}")
    np.testing.assert_allclose(np.asarray(sb.y1), np.asarray(sv.y1),
                               rtol=2e-4, atol=1e-6)

    def loss(args, engine):
        s = odeint_per_sample(f, y0, 0.0, 1.0, args, engine=engine, **kw)
        return jnp.sum(s.y1 ** 2)

    gb = jax.jit(jax.grad(lambda a: loss(a, "batched")))((A,))
    gv = jax.jit(jax.grad(lambda a: loss(a, "vmap")))((A,))
    np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(gv[0]),
                               rtol=5e-3, atol=1e-4)

    # saveat trajectories (dense masked Hermite write) on the chip
    sa = jnp.asarray([0.0, 0.4, 1.0])
    tv = jax.jit(lambda y: odeint_per_sample(
        f, y, 0.0, 1.0, (A,), mode="scan", saveat=sa, **kw))(y0)
    tb = jax.jit(lambda y: odeint_per_sample(
        f, y, 0.0, 1.0, (A,), engine="batched", saveat=sa, **kw))(y0)
    np.testing.assert_allclose(np.asarray(tb.ys), np.asarray(tv.ys),
                               rtol=2e-4, atol=1e-5)


def per_sample_fused_lanes_on_device():
    """The lane-wise fused stage sweep (round 5) on the real chip:
    NeuralODE(per_sample='batched', fused=True) must track the traced
    batched engine per lane (borderline accepts may flip one trial
    step on accumulation-order ulps) and its adjoint gradients must
    match the scan transcript of the SAME program bitwise-tight.
    Guards the lane-wise kernels' Mosaic lowering and their baked
    matmul precision (the bf16-EEst class on a third surface)."""
    from regneuralde_tpu.models import MLPDynamics, NeuralODE
    from regneuralde_tpu import reg

    B, D, H = 64, 64, 32
    m = MLPDynamics(dim=D, hidden=H)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, D)) * 0.5
    kw = dict(rtol=1e-6, atol=1e-6, max_steps=64)
    node_f = NeuralODE(m, per_sample="batched", fused=True, **kw)
    node_u = NeuralODE(m, per_sample="batched", **kw)
    p = node_f.init(jax.random.PRNGKey(1), x)

    nf = np.asarray(jax.jit(lambda p: node_f(p, x).nfe)(p))
    nu = np.asarray(jax.jit(lambda p: node_u(p, x).nfe)(p))
    dn = np.abs(nf - nu)
    assert dn.max() <= 6 and (dn == 0).sum() >= B // 2, (nf, nu)
    assert nf.max() < 2 + 6 * kw["max_steps"], "fused lanes capped"

    def loss(p, mode):
        out = node_f(p, x, mode=mode)
        return (jnp.sum(out.value ** 2)
                + 10.0 * reg.error_estimate(out.telemetry, agg="mean"))

    ga = jax.jit(jax.grad(lambda p: loss(p, "adjoint")))(p)
    gs = jax.jit(jax.grad(lambda p: loss(p, "scan")))(p)
    la = np.concatenate([np.asarray(l).ravel()
                         for l in jax.tree_util.tree_leaves(ga)])
    ls = np.concatenate([np.asarray(l).ravel()
                         for l in jax.tree_util.tree_leaves(gs)])
    assert np.isfinite(la).all()
    rel = float(np.linalg.norm(la - ls) / (np.linalg.norm(ls) + 1e-30))
    assert rel < 1e-5, f"adjoint-vs-scan rel err {rel}"


def run_all():
    """Run every on-device regression; returns ``(passed, failed)``.

    Called by ``bench.py`` so the driver's BENCH_r*.json records a
    ``tpu_regressions`` pass/fail count — a TPU-only gradient-poisoning
    regression can then never ship behind a green CPU suite (the
    reference's warm-start-gradient fail-fast role,
    /root/reference/experiments/mnist_node.jl:201-216).
    """
    global failures, passes
    failures = passes = 0
    check("adjoint_grads_survive_accelerator_precision", adjoint_precision)
    check("whole_solve_grads_match_scan_on_device", whole_solve_grads)
    check("sde_whole_solve_grads_match_unfused_on_device",
          sde_whole_solve_grads)
    check("cached_backward_bitwise_vs_replay_on_device",
          cached_backward_bitwise)
    check("per_sample_lane_parity_and_grads_on_device",
          per_sample_on_device)
    check("per_sample_batched_engine_on_device",
          per_sample_batched_on_device)
    check("per_sample_fused_lanes_on_device",
          per_sample_fused_lanes_on_device)
    return passes, failures


if __name__ == "__main__":
    print("devices:", jax.devices())
    if jax.default_backend() == "cpu":
        print("WARNING: running on CPU — these checks target the TPU")
    run_all()
    sys.exit(1 if failures else 0)
