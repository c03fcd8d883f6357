"""Rosenbrock23 stiff solver + Auto* stiffness-switching composites.

The reference constructs ``AutoTsit5(...)`` composites
(reference: experiments/mnist_node.jl:70-81) whose stiff member upstream
is Tsit5 itself (only the eigen_est telemetry is consumed there); this
suite covers the REAL stiff capability: the ode23s W-method
(ops/rosenbrock.py) and the stiffness switch (ops/ode.py::_make_auto_step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regneuralde_tpu.ops.ode import odeint

scipy_integrate = pytest.importorskip("scipy.integrate")


def rob(t, y, args):
    k1, k2, k3 = args
    return jnp.stack([
        -k1 * y[0] + k3 * y[1] * y[2],
        k1 * y[0] - k3 * y[1] * y[2] - k2 * y[1] ** 2,
        k2 * y[1] ** 2,
    ])


ROB_ARGS = (0.04, 3e7, 1e4)
ROB_Y0 = [1.0, 0.0, 0.0]


def _radau_reference(t1):
    ref = scipy_integrate.solve_ivp(
        lambda t, y: np.asarray(rob(t, jnp.asarray(y), ROB_ARGS)),
        (0.0, t1), np.asarray(ROB_Y0, np.float64), method="Radau",
        rtol=1e-10, atol=1e-12)
    return ref.y[:, -1]


class TestRosenbrock23:
    def test_robertson_matches_radau(self):
        """The canonical stiff problem, integrated to t=100 in ~100 steps
        and pinned against SciPy's Radau at a much tighter tolerance."""
        with jax.enable_x64():
            sol = odeint(rob, jnp.asarray(ROB_Y0, jnp.float64), 0.0, 100.0,
                         ROB_ARGS, solver="rosenbrock23", rtol=1e-6,
                         atol=1e-8, max_steps=1024, mode="while")
            assert bool(sol.stats.success)
            assert int(sol.stats.naccept) < 300
            ref = _radau_reference(100.0)
            np.testing.assert_allclose(np.asarray(sol.y1), ref, rtol=1e-4)

    def test_tsit5_starves_where_rosenbrock_succeeds(self):
        """The capability statement: the explicit flagship solver cannot
        finish Robertson within 4096 trial steps; the W-method needs ~100."""
        with jax.enable_x64():
            y0 = jnp.asarray(ROB_Y0, jnp.float64)
            kw = dict(rtol=1e-6, atol=1e-8, max_steps=4096, mode="while")
            s_exp = odeint(rob, y0, 0.0, 100.0, ROB_ARGS, solver="tsit5",
                           **kw)
            s_stiff = odeint(rob, y0, 0.0, 100.0, ROB_ARGS,
                             solver="rosenbrock23", **kw)
            assert not bool(s_exp.stats.success)
            assert bool(s_stiff.stats.success)
            assert int(s_stiff.stats.nfe) < int(s_exp.stats.nfe) // 20

    def test_nfe_accounting(self):
        """nfe == 2 (init + Hairer probe) + 2 fresh f evals per trial step
        (midpoint F1 + FSAL F2), matching OrdinaryDiffEq's nf convention
        (Jacobian work lands in njacs there, not nf)."""
        sol = odeint(rob, jnp.asarray(ROB_Y0), 0.0, 1.0, ROB_ARGS,
                     solver="rosenbrock23", rtol=1e-4, atol=1e-6,
                     max_steps=512, mode="while")
        nsteps = int(sol.stats.naccept) + int(sol.stats.nreject)
        assert int(sol.stats.nfe) == 2 + 2 * nsteps

    def test_gradient_matches_finite_differences(self):
        """scan-mode reverse AD through the Jacobian + batched LU solves."""
        with jax.enable_x64():
            y0 = jnp.asarray(ROB_Y0, jnp.float64)

            def loss(k1):
                s = odeint(rob, y0, 0.0, 100.0, (k1, 3e7, 1e4),
                           solver="rosenbrock23", rtol=1e-8, atol=1e-10,
                           max_steps=1024, mode="scan")
                return s.y1[2]

            g = jax.grad(loss)(0.04)
            eps = 1e-7
            fd = (loss(0.04 + eps) - loss(0.04 - eps)) / (2 * eps)
            assert abs(g - fd) / abs(fd) < 1e-6

    def test_batched_states_per_sample(self):
        """(batch, dim) states: per-sample Jacobian columns — a batched
        linear problem with per-sample rates has an analytic solution."""
        lam = jnp.asarray([[1.0, 8.0], [6.0, 3.0], [4.0, 0.5]])

        def f(t, y, args):
            return -args * y

        y0 = jnp.ones((3, 2))
        sol = odeint(f, y0, 0.0, 1.0, lam, solver="rosenbrock23",
                     rtol=1e-6, atol=1e-8, max_steps=1024, mode="while")
        np.testing.assert_allclose(
            np.asarray(sol.y1), np.exp(-np.asarray(lam)), rtol=2e-4,
            atol=1e-6)

    def test_nonautonomous_time_term(self):
        """y' = t*y exercises the hd*dF/dt W-method term; y(1) = e^0.5."""
        def f(t, y, args):
            return t * y

        sol = odeint(f, jnp.ones((4,)), 0.0, 1.0, None,
                     solver="rosenbrock23", rtol=1e-6, atol=1e-8,
                     max_steps=512, mode="while")
        np.testing.assert_allclose(
            np.asarray(sol.y1), np.full(4, np.exp(0.5)), rtol=1e-4)

    def test_saveat_interpolation(self):
        """Hermite dense output from (F0, F2) endpoint derivatives."""
        def f(t, y, args):
            return -50.0 * (y - jnp.cos(t))

        sa = jnp.asarray([0.0, 0.3, 0.7, 1.0])
        sol = odeint(f, jnp.zeros((1,)), 0.0, 1.0, None,
                     solver="rosenbrock23", rtol=1e-6, atol=1e-8,
                     max_steps=512, saveat=sa, mode="while")
        lam = 50.0
        t = np.asarray(sa)
        exact = (lam / (1 + lam**2)) * (
            lam * np.cos(t) + np.sin(t) - lam * np.exp(-lam * t))
        np.testing.assert_allclose(
            np.asarray(sol.ys)[:, 0], exact, rtol=1e-3, atol=1e-5)

    def test_adjoint_mode_matches_scan(self):
        """The replay-based adjoint engine differentiates the same W-method
        trial step (vjp through lu_factor/lu_solve)."""
        with jax.enable_x64():
            y0 = jnp.asarray(ROB_Y0, jnp.float64)

            def loss(k1, mode):
                s = odeint(rob, y0, 0.0, 10.0, (k1, 3e7, 1e4),
                           solver="rosenbrock23", rtol=1e-8, atol=1e-10,
                           max_steps=1024, mode=mode)
                return s.y1[2]

            g_scan = jax.grad(lambda k: loss(k, "scan"))(0.04)
            g_adj = jax.grad(lambda k: loss(k, "adjoint"))(0.04)
            np.testing.assert_allclose(float(g_adj), float(g_scan),
                                       rtol=1e-10)

    def test_pytree_state_rejected(self):
        def f(t, y, args):
            return {"a": -y["a"]}

        with pytest.raises(TypeError, match="ndarray states"):
            odeint(f, {"a": jnp.ones(2)}, 0.0, 1.0, None,
                   solver="rosenbrock23", rtol=1e-4, atol=1e-6,
                   max_steps=32, mode="while")


class TestModelLayer:
    def test_neural_ode_with_rosenbrock(self):
        """The public model API composes with the stiff solver: forward +
        gradient through NeuralODE(solver='rosenbrock23')."""
        from regneuralde_tpu.models import MLPDynamics, NeuralODE

        x = jax.random.normal(jax.random.PRNGKey(0), (16, 6)) * 0.4
        node = NeuralODE(MLPDynamics(dim=6, hidden=8), time_dep=True,
                         solver="rosenbrock23", rtol=1e-4, atol=1e-6,
                         max_steps=64)
        p = node.init(jax.random.PRNGKey(1), x)
        out = node(p, x)
        assert bool(jnp.all(jnp.isfinite(out.value)))
        assert int(out.nfe) == 2 + 2 * int(
            jnp.sum(out.telemetry.live))

        g = jax.grad(lambda pp: jnp.sum(node(pp, x).value ** 2))(p)
        assert all(bool(jnp.all(jnp.isfinite(l)))
                   for l in jax.tree_util.tree_leaves(g))


class TestDataParallel:
    def test_dp_rosenbrock_matches_single_device(self):
        """rosenbrock23 under shard_map data parallelism: the per-sample
        Jacobians and LU solves are shard-local; only the error norm is
        psum'd, so step control stays in lockstep and the trajectory and
        NFE match the single-device solve."""
        from jax.sharding import PartitionSpec as P

        from regneuralde_tpu import parallel as par

        assert jax.device_count() >= 8
        mesh = par.make_mesh(8)
        y0 = jax.random.normal(jax.random.PRNGKey(0), (16, 4))
        lam = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (1, 4))) * 40

        def f(t, y, args):
            return -args * y + 0.1 * jnp.sin(t)

        kw = dict(solver="rosenbrock23", rtol=1e-5, atol=1e-7,
                  max_steps=64, mode="while")
        ref = odeint(f, y0, 0.0, 1.0, lam, **kw)

        def shard_solve(y0, lam):
            sol = odeint(f, y0, 0.0, 1.0, lam, axis_name="data", **kw)
            return sol.y1, sol.stats.nfe

        mapped = jax.jit(jax.shard_map(
            shard_solve, mesh=mesh,
            in_specs=(P("data", None), P()),
            out_specs=(P("data", None), P()),
        ))
        y1, nfe = mapped(par.shard_batch(mesh, y0),
                         par.replicate(mesh, lam))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(ref.y1),
                                   rtol=2e-5, atol=1e-6)
        assert int(nfe) == int(ref.stats.nfe)

    def test_dp_auto_composite_switches_in_lockstep(self):
        """The Auto* composite under shard_map: eigen_est is pmax'd, so
        every shard takes the same switch decision — NFE and trajectory
        match the single-device composite exactly."""
        from jax.sharding import PartitionSpec as P

        from regneuralde_tpu import parallel as par

        assert jax.device_count() >= 8
        mesh = par.make_mesh(8)
        y0 = jax.random.normal(jax.random.PRNGKey(0), (16, 4)) * 0.5
        lam = jnp.asarray([[300.0, 150.0, 80.0, 40.0]])

        def f(t, y, args):
            return -args * (y - jnp.cos(8.0 * t))

        kw = dict(solver="auto_tsit5_rosenbrock23", rtol=1e-5, atol=1e-7,
                  max_steps=512, mode="while")
        ref = odeint(f, y0, 0.0, 2.0, lam, **kw)
        assert bool(ref.stats.success)

        def shard_solve(y0, lam):
            sol = odeint(f, y0, 0.0, 2.0, lam, axis_name="data", **kw)
            return sol.y1, sol.stats.nfe

        mapped = jax.jit(jax.shard_map(
            shard_solve, mesh=mesh,
            in_specs=(P("data", None), P()),
            out_specs=(P("data", None), P()),
        ))
        y1, nfe = mapped(par.shard_batch(mesh, y0),
                         par.replicate(mesh, lam))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(ref.y1),
                                   rtol=2e-4, atol=1e-5)
        # psum-of-shard-sums rounds eest differently from one global sum,
        # so a borderline accept can flip vs the single-device run (~1
        # trial step in ~330 here). The lockstep property — every shard
        # taking the SAME decision — is structural (eest and eigen_est
        # are axis-invariant) and is what the y1 agreement witnesses.
        assert abs(int(nfe) - int(ref.stats.nfe)) <= 12


class TestAutoSwitch:
    def test_switches_and_solves_robertson(self):
        """auto_tsit5_rosenbrock23 starts explicit, detects stiffness, and
        finishes in ~1/30th of the explicit step count — with the answer
        pinned to the pure stiff solve."""
        with jax.enable_x64():
            y0 = jnp.asarray(ROB_Y0, jnp.float64)
            kw = dict(rtol=1e-6, atol=1e-8, max_steps=4096, mode="while")
            s_auto = odeint(rob, y0, 0.0, 100.0, ROB_ARGS,
                            solver="auto_tsit5_rosenbrock23", **kw)
            assert bool(s_auto.stats.success)
            assert int(s_auto.stats.naccept) + int(s_auto.stats.nreject) < 400
            ref = _radau_reference(100.0)
            np.testing.assert_allclose(np.asarray(s_auto.y1), ref, rtol=1e-4)

    def test_equals_tsit5_on_nonstiff(self):
        """No switch fires on a smooth problem: the composite's trajectory,
        NFE, and result are BITWISE those of plain Tsit5."""
        def f(t, y, args):
            return -y * args

        y0 = jnp.linspace(0.5, 1.5, 8)
        kw = dict(rtol=1e-7, atol=1e-7, max_steps=64, mode="while")
        s_auto = odeint(f, y0, 0.0, 1.0, 1.0,
                        solver="auto_tsit5_rosenbrock23", **kw)
        s_ts = odeint(f, y0, 0.0, 1.0, 1.0, solver="tsit5", **kw)
        assert int(s_auto.stats.nfe) == int(s_ts.stats.nfe)
        assert bool(jnp.all(s_auto.y1 == s_ts.y1))

    def test_gradient_through_switched_solve(self):
        """scan-mode AD through the composite (cond over both arms)."""
        with jax.enable_x64():
            y0 = jnp.asarray(ROB_Y0, jnp.float64)

            def loss(k1, solver):
                s = odeint(rob, y0, 0.0, 100.0, (k1, 3e7, 1e4),
                           solver=solver, rtol=1e-8, atol=1e-10,
                           max_steps=2048, mode="scan")
                return s.y1[2]

            g_auto = jax.grad(lambda k: loss(k, "auto_tsit5_rosenbrock23"))(
                0.04)
            g_rb = jax.grad(lambda k: loss(k, "rosenbrock23"))(0.04)
            # Different accepted-step sequences -> close, not equal.
            np.testing.assert_allclose(float(g_auto), float(g_rb), rtol=1e-4)

    def test_adjoint_gradient_matches_scan_on_switched_solve(self):
        """mode="adjoint" through the composite: the switching state
        (alg, run, n_stiff) rides the adjoint history, so the backward
        replays each trial step through the SAME arm the forward took —
        gradients must match the scan oracle on a solve that actually
        switches (round-4 capability; reference: the AutoTsit5 composite
        trained through, experiments/mnist_node.jl:70-81)."""
        with jax.enable_x64():
            y0 = jnp.asarray(ROB_Y0, jnp.float64)

            def loss(k1, mode):
                s = odeint(rob, y0, 0.0, 100.0, (k1, 3e7, 1e4),
                           solver="auto_tsit5_rosenbrock23", rtol=1e-8,
                           atol=1e-10, max_steps=2048, mode=mode)
                return s.y1[2]

            # Same engine-independent solve: step sequences are identical,
            # so gradients agree to replay rounding, not just statistics.
            g_adj = jax.grad(lambda k: loss(k, "adjoint"))(0.04)
            g_scan = jax.grad(lambda k: loss(k, "scan"))(0.04)
            np.testing.assert_allclose(float(g_adj), float(g_scan),
                                       rtol=1e-9)
            # And the forward stats agree (the switch fired identically).
            s_adj = odeint(rob, y0, 0.0, 100.0, ROB_ARGS,
                           solver="auto_tsit5_rosenbrock23", rtol=1e-8,
                           atol=1e-10, max_steps=2048, mode="adjoint")
            s_while = odeint(rob, y0, 0.0, 100.0, ROB_ARGS,
                             solver="auto_tsit5_rosenbrock23", rtol=1e-8,
                             atol=1e-10, max_steps=2048, mode="while")
            assert int(s_adj.stats.nfe) == int(s_while.stats.nfe)
            assert bool(s_adj.stats.success)

    def test_adjoint_equals_tsit5_on_nonstiff(self):
        """No switch on a smooth problem: composite adjoint-mode forward
        is BITWISE plain Tsit5's, and gradients flow."""
        def f(t, y, args):
            return -y * args

        y0 = jnp.linspace(0.5, 1.5, 8)
        kw = dict(rtol=1e-7, atol=1e-7, max_steps=64, mode="adjoint")
        s_auto = odeint(f, y0, 0.0, 1.0, 1.0,
                        solver="auto_tsit5_rosenbrock23", **kw)
        s_ts = odeint(f, y0, 0.0, 1.0, 1.0, solver="tsit5", **kw)
        assert int(s_auto.stats.nfe) == int(s_ts.stats.nfe)
        assert bool(jnp.all(s_auto.y1 == s_ts.y1))
        g = jax.grad(lambda a: jnp.sum(odeint(
            f, y0, 0.0, 1.0, a, solver="auto_tsit5_rosenbrock23",
            **kw).y1 ** 2))(1.0)
        g_ts = jax.grad(lambda a: jnp.sum(odeint(
            f, y0, 0.0, 1.0, a, solver="tsit5", **kw).y1 ** 2))(1.0)
        np.testing.assert_allclose(float(g), float(g_ts), rtol=1e-6)

    def test_unknown_composite_raises(self):
        with pytest.raises(ValueError, match="auto_"):
            odeint(rob, jnp.asarray(ROB_Y0), 0.0, 1.0, ROB_ARGS,
                   solver="auto_tsit5_sdirk", rtol=1e-4, atol=1e-6,
                   max_steps=32, mode="while")
