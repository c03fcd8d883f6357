"""Whole-solve fused kernel tests (ops.pallas_solve, interpret mode on CPU).

Contract: a whole-solve integration must take the SAME accepted/rejected
step sequence as the scan oracle (identical NFE), land on the same
trajectory to f32 rounding, and its one-kernel backward must match
autodiff through the scan path — including gradients through the
interpolated saveat trajectory, the EEst*dt regularizer, x0, and tspan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regneuralde_tpu import reg
from regneuralde_tpu.models import AlternatingMLP, CSLDynamics, FFJORD, NeuralODE
from regneuralde_tpu.ops import odeint
from regneuralde_tpu.ops.pallas_generic import (
    alternating_mlp_apply,
    alternating_mlp_leaves,
)
from regneuralde_tpu.ops.pallas_solve import (
    vmem_estimate,
    vmem_estimate_tiled,
    whole_solve_odeint,
    whole_solve_odeint_tiled,
)

KEY = jax.random.PRNGKey(0)


def _setup(batch=8, dim=6, hidden=10, depth=2):
    m = AlternatingMLP(dim=dim, hidden=hidden, depth=depth)
    y = jax.random.normal(KEY, (batch, dim)) * 0.5
    p = m.init(KEY, y)
    f = lambda t, yy, pp: m.apply(pp, yy)
    apply_fn = alternating_mlp_apply(depth)
    flatten = lambda pp: alternating_mlp_leaves(pp, depth)
    return m, y, p, f, apply_fn, flatten


SA = jnp.asarray([0.0, 0.2, 0.5, 0.8, 1.0])


class TestWholeSolve:
    @pytest.mark.parametrize("saveat", [None, SA], ids=["final", "saveat"])
    def test_forward_matches_scan(self, saveat):
        _, y, p, f, apply_fn, flatten = _setup()
        kw = dict(rtol=1e-4, atol=1e-4, max_steps=48)
        ws = whole_solve_odeint(f, apply_fn, flatten, y, 0.0, 1.0, p,
                                saveat=saveat, **kw)
        ref = odeint(f, y, 0.0, 1.0, p, saveat=saveat, mode="scan", **kw)
        assert int(ws.stats.nfe) == int(ref.stats.nfe)
        assert bool(ws.stats.success)
        np.testing.assert_allclose(np.asarray(ws.y1), np.asarray(ref.y1),
                                   rtol=1e-5, atol=1e-7)
        if saveat is not None:
            np.testing.assert_allclose(np.asarray(ws.ys), np.asarray(ref.ys),
                                       rtol=1e-5, atol=1e-7)
        live = np.asarray(ref.telemetry.live)
        np.testing.assert_array_equal(np.asarray(ws.telemetry.live), live)
        np.testing.assert_array_equal(
            np.asarray(ws.telemetry.accepted)[live],
            np.asarray(ref.telemetry.accepted)[live])
        np.testing.assert_allclose(
            np.asarray(ws.telemetry.eest)[live],
            np.asarray(ref.telemetry.eest)[live], rtol=1e-5, atol=1e-8)

    @pytest.mark.parametrize("saveat", [None, SA], ids=["final", "saveat"])
    def test_grads_match_scan(self, saveat):
        _, y, p, f, apply_fn, flatten = _setup()
        kw = dict(rtol=1e-4, atol=1e-4, max_steps=48)

        def value(s):
            return s.ys if saveat is not None else s.y1

        def loss_ws(p):
            s = whole_solve_odeint(f, apply_fn, flatten, y, 0.0, 1.0, p,
                                   saveat=saveat, **kw)
            return (jnp.sum(value(s) ** 2)
                    + 10.0 * reg.error_estimate(s.telemetry, agg="mean"))

        def loss_ref(p):
            s = odeint(f, y, 0.0, 1.0, p, saveat=saveat, mode="scan", **kw)
            return (jnp.sum(value(s) ** 2)
                    + 10.0 * reg.error_estimate(s.telemetry, agg="mean"))

        g1 = jax.grad(loss_ws)(p)
        g2 = jax.grad(loss_ref)(p)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-5)

    def test_x0_grads_through_save_buffer(self):
        _, y, p, f, apply_fn, flatten = _setup()
        kw = dict(rtol=1e-4, atol=1e-4, max_steps=48, saveat=SA)

        gx = jax.grad(lambda x: jnp.sum(whole_solve_odeint(
            f, apply_fn, flatten, x, 0.0, 1.0, p, **kw).ys ** 2))(y)
        gr = jax.grad(lambda x: jnp.sum(odeint(
            f, x, 0.0, 1.0, p, mode="scan", **kw).ys ** 2))(y)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                                   rtol=2e-3, atol=1e-5)

    def test_tspan_grads(self):
        _, y, p, f, apply_fn, flatten = _setup()
        kw = dict(rtol=1e-4, atol=1e-4, max_steps=48)
        g1 = jax.grad(lambda t1: jnp.sum(whole_solve_odeint(
            f, apply_fn, flatten, y, 0.0, t1, p, **kw).y1 ** 2))(
            jnp.float32(1.0))
        g2 = jax.grad(lambda t1: jnp.sum(odeint(
            f, y, 0.0, t1, p, mode="scan", **kw).y1 ** 2))(jnp.float32(1.0))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-3, atol=1e-6)

    def test_starved_max_steps_reports_failure(self):
        _, y, p, f, apply_fn, flatten = _setup()
        s = whole_solve_odeint(f, apply_fn, flatten, y, 0.0, 1.0, p,
                               rtol=1e-8, atol=1e-8, max_steps=3)
        assert not bool(s.stats.success)
        assert np.isfinite(np.asarray(s.y1)).all()
        g = jax.grad(lambda p: jnp.sum(whole_solve_odeint(
            f, apply_fn, flatten, y, 0.0, 1.0, p, rtol=1e-8, atol=1e-8,
            max_steps=3).y1 ** 2))(p)
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree_util.tree_leaves(g))

    def test_starved_solve_with_saveat(self):
        """Partial save-cursor consumption: the failed solve only reaches
        some of the save grid — reached rows match the scan engine,
        unreached rows stay at their seeds, and gradients through the
        partial ys are finite and match scan (the backward's [cur0, curf)
        consumed range is a strict subset of the grid here)."""
        _, y, p, f, apply_fn, flatten = _setup()
        kw = dict(rtol=1e-8, atol=1e-8, max_steps=4, saveat=SA)
        s = whole_solve_odeint(f, apply_fn, flatten, y, 0.0, 1.0, p, **kw)
        r = odeint(f, y, 0.0, 1.0, p, mode="scan", **kw)
        assert not bool(s.stats.success)
        np.testing.assert_allclose(np.asarray(s.ys), np.asarray(r.ys),
                                   rtol=1e-4, atol=1e-6)
        gx = jax.grad(lambda p: jnp.sum(whole_solve_odeint(
            f, apply_fn, flatten, y, 0.0, 1.0, p, **kw).ys ** 2))(p)
        gr = jax.grad(lambda p: jnp.sum(odeint(
            f, y, 0.0, 1.0, p, mode="scan", **kw).ys ** 2))(p)
        for a, b in zip(jax.tree_util.tree_leaves(gx),
                        jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-5)


class TestTiledWholeSolve:
    """The batch-tiled whole-solve (VMEM-scratch carry, per-tile stage
    sweeps) — the flagship-scale engine. Final-state solves only."""

    def test_forward_matches_scan_multi_tile(self):
        _, y, p, f, apply_fn, flatten = _setup(batch=64)
        kw = dict(rtol=1e-4, atol=1e-4, max_steps=48)
        ws = whole_solve_odeint_tiled(f, apply_fn, flatten, y, 0.0, 1.0, p,
                                      tile_rows=32, **kw)  # 2 tiles
        ref = odeint(f, y, 0.0, 1.0, p, mode="scan", **kw)
        assert int(ws.stats.nfe) == int(ref.stats.nfe)
        assert bool(ws.stats.success)
        np.testing.assert_allclose(np.asarray(ws.y1), np.asarray(ref.y1),
                                   rtol=1e-5, atol=1e-6)
        live = np.asarray(ref.telemetry.live)
        np.testing.assert_array_equal(np.asarray(ws.telemetry.live), live)
        # The embedded error is a catastrophic cancellation of O(1) stage
        # values, so near tight tolerances EEst carries f32 noise that is
        # sensitive to matmul tiling (tile_rows=batch reproduces the scan
        # oracle bitwise; smaller tiles perturb it a few percent while the
        # step SEQUENCE — the controller's decisions — stays identical).
        np.testing.assert_allclose(
            np.asarray(ws.telemetry.eest)[live],
            np.asarray(ref.telemetry.eest)[live], rtol=0.15, atol=1e-7)

    def test_grads_match_scan(self):
        _, y, p, f, apply_fn, flatten = _setup(batch=64)
        kw = dict(rtol=1e-4, atol=1e-4, max_steps=48)

        def loss_ws(p):
            s = whole_solve_odeint_tiled(f, apply_fn, flatten, y, 0.0, 1.0,
                                         p, tile_rows=32, **kw)
            return (jnp.sum(s.y1 ** 2)
                    + 10.0 * reg.error_estimate(s.telemetry, agg="mean"))

        def loss_ref(p):
            s = odeint(f, y, 0.0, 1.0, p, mode="scan", **kw)
            return (jnp.sum(s.y1 ** 2)
                    + 10.0 * reg.error_estimate(s.telemetry, agg="mean"))

        g1 = jax.grad(loss_ws)(p)
        g2 = jax.grad(loss_ref)(p)
        # looser than the monolithic test: the reg term reads EEst, which
        # carries tiling-sensitive f32 cancellation noise (see forward test)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-2, atol=1e-5)

    def test_x0_and_tspan_grads(self):
        _, y, p, f, apply_fn, flatten = _setup(batch=64)
        kw = dict(rtol=1e-4, atol=1e-4, max_steps=48)
        gx = jax.grad(lambda x: jnp.sum(whole_solve_odeint_tiled(
            f, apply_fn, flatten, x, 0.0, 1.0, p, tile_rows=32,
            **kw).y1 ** 2))(y)
        gr = jax.grad(lambda x: jnp.sum(odeint(
            f, x, 0.0, 1.0, p, mode="scan", **kw).y1 ** 2))(y)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                                   rtol=2e-3, atol=1e-5)
        g1 = jax.grad(lambda t1: jnp.sum(whole_solve_odeint_tiled(
            f, apply_fn, flatten, y, 0.0, t1, p, tile_rows=32,
            **kw).y1 ** 2))(jnp.float32(1.0))
        g2 = jax.grad(lambda t1: jnp.sum(odeint(
            f, y, 0.0, t1, p, mode="scan", **kw).y1 ** 2))(jnp.float32(1.0))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-3, atol=1e-6)

    def test_flagship_shape_routes_to_tiled(self):
        # A batch over the monolithic VMEM budget but under the tiled one
        # must take the tiled whole-solve under fused=True auto-selection
        # and agree with the scan oracle.
        from regneuralde_tpu.models import MLPDynamics

        from regneuralde_tpu.ops import pallas_solve as ps

        batch, dim = 1024, 784
        assert vmem_estimate(batch, dim) > 64 * 2**20
        m = MLPDynamics(dim=dim, hidden=32)
        node = NeuralODE(m, rtol=1e-3, atol=1e-3, max_steps=24, fused=True)
        x = jax.random.normal(KEY, (batch, dim)) * 0.1
        p = node.init(jax.random.PRNGKey(1), x)
        calls = []
        orig = ps.whole_solve_odeint_tiled

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        ps.whole_solve_odeint_tiled = spy
        try:
            out = node(p, x, mode="adjoint")
        finally:
            ps.whole_solve_odeint_tiled = orig
        assert calls, "fused=True did not route to the tiled whole-solve"
        ref = NeuralODE(m, rtol=1e-3, atol=1e-3, max_steps=24)(
            p, x, mode="scan")
        assert int(out.nfe) == int(ref.nfe)
        np.testing.assert_allclose(np.asarray(out.value),
                                   np.asarray(ref.value),
                                   rtol=1e-5, atol=1e-5)

    def test_tiled_forced_with_saveat_raises(self):
        from regneuralde_tpu.models import MLPDynamics

        node = NeuralODE(MLPDynamics(dim=8, hidden=8), rtol=1e-3,
                         atol=1e-3, saveat=SA, fused="tiled")
        x = jax.random.normal(KEY, (64, 8))
        p = node.init(jax.random.PRNGKey(1), x)
        with pytest.raises(ValueError, match="final-state"):
            node(p, x, mode="adjoint")


class TestModelRouting:
    def test_neural_ode_auto_routes_small_dynamics(self):
        m, y, p0, f, _, _ = _setup()
        node = NeuralODE(m, time_dep=False, rtol=1e-4, atol=1e-4,
                         max_steps=48, saveat=SA, fused=True)
        p = node.init(jax.random.PRNGKey(1), y)
        out_ws = node(p, y, mode="adjoint")  # auto -> whole-solve
        out_ref = NeuralODE(m, time_dep=False, rtol=1e-4, atol=1e-4,
                            max_steps=48, saveat=SA)(p, y, mode="scan")
        assert int(out_ws.nfe) == int(out_ref.nfe)
        np.testing.assert_allclose(np.asarray(out_ws.value),
                                   np.asarray(out_ref.value),
                                   rtol=1e-5, atol=1e-7)

    def test_fused_step_forces_step_kernels(self):
        # fused="step" must not take the whole-solve path (it is the
        # DP-composable engine); outputs still match.
        m, y, p0, f, _, _ = _setup()
        node_s = NeuralODE(m, time_dep=False, rtol=1e-4, atol=1e-4,
                           max_steps=48, fused="step")
        node_w = NeuralODE(m, time_dep=False, rtol=1e-4, atol=1e-4,
                           max_steps=48, fused="solve")
        p = node_s.init(jax.random.PRNGKey(1), y)
        o1 = node_s(p, y, mode="adjoint")
        o2 = node_w(p, y, mode="adjoint")
        assert int(o1.nfe) == int(o2.nfe)
        np.testing.assert_allclose(np.asarray(o1.value),
                                   np.asarray(o2.value), rtol=1e-5,
                                   atol=1e-7)

    def test_vmem_gates(self):
        # vmem_estimate is calibrated 1:1 against the round-5 Mosaic
        # bisection (flagship gradient fits an 88MB scoped limit, fails
        # at 80MB; estimate 80.5MB) and the model routing gates at 96MB
        # under the 112MB hard limit: the 784-wide flagship and the
        # latent saveat shape stay monolithic; very large batches fall
        # through to the tiled engine.
        assert 78 * 2**20 <= vmem_estimate(512, 784) <= 88 * 2**20
        assert vmem_estimate(512, 784) <= 96 * 2**20
        assert vmem_estimate(256, 20, 49) <= 96 * 2**20
        assert vmem_estimate(1024, 784) > 96 * 2**20
        assert vmem_estimate_tiled(1024, 784, 128) <= 64 * 2**20

    def test_ffjord_whole_solve_matches_unfused(self):
        dyn = CSLDynamics(dim=3, hidden=8)
        x = jax.random.normal(KEY, (8, 3)) * 0.5
        kw = dict(input_dim=3, rtol=1e-4, atol=1e-4, max_steps=48,
                  analytic_vjp=True)
        ff = FFJORD(dyn, **kw)
        ff_ws = FFJORD(dyn, fused="solve", **kw)
        p = ff.init(jax.random.PRNGKey(1), x)
        key = jax.random.PRNGKey(2)

        o_ref = ff(p, x, key, mode="scan")
        o_ws = ff_ws(p, x, key, mode="adjoint")
        assert int(o_ref.nfe) == int(o_ws.nfe)
        np.testing.assert_allclose(np.asarray(o_ws.logpx),
                                   np.asarray(o_ref.logpx),
                                   rtol=1e-4, atol=1e-5)

        def loss(model, p, mode):
            out = model(p, x, key, mode=mode)
            return (-jnp.mean(out.logpx)
                    + 0.1 * reg.error_estimate(out.telemetry, agg="mean"))

        g1 = jax.grad(lambda p: loss(ff_ws, p, "adjoint"))(p)
        g2 = jax.grad(lambda p: loss(ff, p, "scan"))(p)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-2, atol=5e-4)


class TestBatchAlignmentGuards:
    """Mosaic faults the TPU WORKER (not a Python error) on whole-solve
    VMEM refs whose batch is not a multiple of 8 — measured round 4 on a
    (100, 2) SDE solve (dim/saveat exonerated by bisect: (96, 2) and
    (64, 2) run, (100, 2) and (100, 8) fault). Round 5: the entry points
    PAD such batches with masked rows (n_real) instead of refusing, so
    the reference's literal sde_toy workload (100 trajectories,
    experiments/sde_toy_problem.jl:61-76) keeps the fused engine. The
    padding runs on every backend, so these parity checks exercise the
    exact TPU code path in interpret mode."""

    @pytest.mark.parametrize("saveat", [None, SA], ids=["final", "saveat"])
    def test_whole_solve_pads_misaligned_batch(self, saveat):
        # Pad rows must not perturb step control (NFE equal), the
        # trajectory, or the gradients vs the unfused scan oracle.
        _, y, p, f, apply_fn, flatten = _setup(batch=10)
        kw = dict(rtol=1e-4, atol=1e-4, max_steps=48)
        ws = whole_solve_odeint(f, apply_fn, flatten, y, 0.0, 1.0, p,
                                saveat=saveat, **kw)
        ref = odeint(f, y, 0.0, 1.0, p, saveat=saveat, mode="scan", **kw)
        assert ws.y1.shape == y.shape
        assert int(ws.stats.nfe) == int(ref.stats.nfe)
        np.testing.assert_allclose(np.asarray(ws.y1), np.asarray(ref.y1),
                                   rtol=1e-5, atol=1e-7)
        if saveat is not None:
            assert ws.ys.shape == (SA.shape[0],) + y.shape
            np.testing.assert_allclose(np.asarray(ws.ys),
                                       np.asarray(ref.ys),
                                       rtol=1e-5, atol=1e-7)

        def value(s):
            return s.ys if saveat is not None else s.y1

        def loss_ws(p, x):
            s = whole_solve_odeint(f, apply_fn, flatten, x, 0.0, 1.0, p,
                                   saveat=saveat, **kw)
            return (jnp.sum(value(s) ** 2)
                    + 10.0 * reg.error_estimate(s.telemetry, agg="mean"))

        def loss_ref(p, x):
            s = odeint(f, x, 0.0, 1.0, p, saveat=saveat, mode="scan", **kw)
            return (jnp.sum(value(s) ** 2)
                    + 10.0 * reg.error_estimate(s.telemetry, agg="mean"))

        g1 = jax.grad(loss_ws, argnums=(0, 1))(p, y)
        g2 = jax.grad(loss_ref, argnums=(0, 1))(p, y)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-5)

    def test_sde_whole_solve_pads_misaligned_batch(self):
        # The reference's literal 100-trajectory shape: fused must match
        # the unfused sdeint draw-for-draw (same presampled noise per
        # real lane) with identical accept/reject counts and gradients.
        from regneuralde_tpu.ops.pallas_sde import whole_solve_sdeint
        from regneuralde_tpu.ops.sde import sdeint

        w = jax.random.normal(KEY, (2, 2)) * 0.3
        drift = lambda t, y, a: jnp.tanh(y @ a)
        diff = lambda t, y, a: 0.1 * jnp.ones_like(y)
        y = jax.random.normal(jax.random.PRNGKey(7), (100, 2))
        key = jax.random.PRNGKey(3)
        kw = dict(key=key, solver="sosri", rtol=1e-1, atol=1e-1,
                  max_steps=32)
        ws = whole_solve_sdeint(drift, diff, y, 0.0, 1.0, w, **kw)
        ref = sdeint(drift, diff, y, 0.0, 1.0, w, mode="scan", **kw)
        assert ws.y1.shape == y.shape
        assert int(ws.stats.naccept) == int(ref.stats.naccept)
        assert int(ws.stats.nreject) == int(ref.stats.nreject)
        np.testing.assert_allclose(np.asarray(ws.y1), np.asarray(ref.y1),
                                   rtol=1e-5, atol=1e-6)

        def loss_ws(w):
            s = whole_solve_sdeint(drift, diff, y, 0.0, 1.0, w, **kw)
            return (jnp.sum(s.y1 ** 2)
                    + reg.error_estimate(s.telemetry, agg="mean"))

        def loss_ref(w):
            s = sdeint(drift, diff, y, 0.0, 1.0, w, mode="scan", **kw)
            return (jnp.sum(s.y1 ** 2)
                    + reg.error_estimate(s.telemetry, agg="mean"))

        g1 = jax.grad(loss_ws)(w)
        g2 = jax.grad(loss_ref)(w)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-3, atol=1e-5)

    def test_tiled_refuses_indivisible_tile(self):
        _, y, p, f, apply_fn, flatten = _setup(batch=100)
        with pytest.raises(ValueError, match="tile_rows"):
            whole_solve_odeint_tiled(f, apply_fn, flatten, y, 0.0, 1.0, p,
                                     rtol=1e-3, atol=1e-3, max_steps=16,
                                     tile_rows=64)


class TestHandAlgebraBackward:
    """The MLPDynamics whole-solve path runs the HAND-derived algebra
    pullback (ops.pallas_mlp.make_normed_algebra_bwd) seeded from stage
    residuals captured by the matching forward
    (make_normed_algebra_fwd_res) — neither is exercised by the
    AlternatingMLP fixtures above (their algebra_bwd is None, the traced
    transpose). Pins (a) the hand path against the scan oracle through
    the model routing, and (b) the residual-capture variant bitwise
    against the in-pullback recompute it replaces."""

    def _mlp_setup(self):
        from regneuralde_tpu.models import MLPDynamics

        m = MLPDynamics(dim=8, hidden=6)
        x = jax.random.normal(KEY, (8, 8)) * 0.5
        node_w = NeuralODE(m, rtol=1e-4, atol=1e-4, max_steps=48,
                           fused="solve")
        node_u = NeuralODE(m, rtol=1e-4, atol=1e-4, max_steps=48)
        p = node_w.init(jax.random.PRNGKey(1), x)
        return node_w, node_u, x, p

    def test_mlp_whole_solve_grads_match_scan(self):
        node_w, node_u, x, p = self._mlp_setup()

        def loss(p, node, mode):
            out = node(p, x, mode=mode)
            r = jnp.sum(jnp.where(out.telemetry.accepted,
                                  out.telemetry.eest * out.telemetry.dt,
                                  0.0))
            return jnp.sum(out.value ** 2) + 0.3 * r

        g_ws = jax.grad(lambda p: loss(p, node_w, "adjoint"))(p)
        g_ref = jax.grad(lambda p: loss(p, node_u, "scan"))(p)
        for a, b in zip(jax.tree_util.tree_leaves(g_ws),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-5)

    def test_fwd_res_bitwise_vs_stage_algebra(self):
        # The residual-capturing algebra must be op-for-op the plain
        # algebra (same quintuple, SAME floats): the whole-solve backward
        # replays controller decisions from its values, and one flipped
        # accept corrupts the adjoint. Direct unit check so a future edit
        # to either function fails HERE, not in an end-to-end gradient.
        from regneuralde_tpu.ops.pallas_generic import (
            _stage_algebra,
            _stage_algebra_from_ks,
        )

        node_w, _, x, p = self._mlp_setup()
        apply_fn, flatten, _alg_bwd, alg_fwd_res = node_w._whole_solve_parts(
            p)
        leaves = flatten(p)
        t = jnp.float32(0.15)
        dt = jnp.float32(0.07)
        k1 = apply_fn(t, x, leaves)
        plain = _stage_algebra(apply_fn, 1e-4, 1e-4)
        outs_plain = plain(t, dt, x, k1, leaves)
        outs_res, (ks, hs) = alg_fwd_res(t, dt, x, k1, leaves)
        for a, b in zip(outs_plain, outs_res):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # ...and the stored-ks recombination (the round-5 no-replay
        # backward's primal) must reproduce the same quintuple bitwise —
        # one flipped controller decision in the replayed backward would
        # corrupt the adjoint outright.
        recomb = _stage_algebra_from_ks(1e-4, 1e-4)
        outs_rec = recomb(t, dt, x, k1, ks[1:])
        for a, b in zip(outs_plain, outs_rec):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_cached_backward_matches_replay(self):
        # With algebra_fwd_res the backward kernel streams stored stage
        # residuals and SKIPS the replay (round 5) — a structurally
        # different program from the replay backward, so its gradient
        # floats may differ by ulps; the step sequence and loss must be
        # identical, the gradients near-bitwise.
        node_w, _, x, p = self._mlp_setup()
        apply_fn, flatten, alg_bwd, alg_fwd_res = node_w._whole_solve_parts(p)

        def loss(p, afr):
            sol = whole_solve_odeint(
                node_w._func, apply_fn, flatten, x, 0.0, 1.0, p,
                rtol=1e-4, atol=1e-4, max_steps=48,
                algebra_bwd=alg_bwd, algebra_fwd_res=afr)
            tel = sol.telemetry
            r = jnp.sum(jnp.where(tel.accepted, tel.eest * tel.dt, 0.0))
            return jnp.sum(sol.y1 ** 2) + 0.3 * r, sol.stats.nfe

        (l_res, nfe_res), g_res = jax.value_and_grad(
            lambda p: loss(p, alg_fwd_res), has_aux=True)(p)
        (l_rec, nfe_rec), g_rec = jax.value_and_grad(
            lambda p: loss(p, None), has_aux=True)(p)
        assert int(nfe_res) == int(nfe_rec)
        np.testing.assert_array_equal(np.asarray(l_res), np.asarray(l_rec))
        # On the TPU the two engines measured BITWISE-equal gradients
        # (tools/probe_cached_bwd.py, evidence/r5_backward_attribution);
        # XLA:CPU in interpret mode fuses the two graphs differently and
        # accumulates ~1e-5 relative matmul-order noise over the reverse
        # sweep — hence the looser CPU tolerance here.
        for a, b in zip(jax.tree_util.tree_leaves(g_res),
                        jax.tree_util.tree_leaves(g_rec)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
