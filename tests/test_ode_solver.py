"""Solver-core unit tests against analytic ODE solutions.

The reference has no numeric tests (its test/ dir only checks Julia type
stability); these tests define the correctness contract of the rebuilt
solver layer: tolerance-for-tolerance accuracy, step accounting that
matches OrdinaryDiffEq's destats.nf convention, dense output, and
scan/while path equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np

from regneuralde_tpu.ops import odeint


def exp_decay(t, y, args):
    return -args * y


def oscillator(t, y, args):
    # y = (pos, vel); analytic: pos = cos(w t), vel = -w sin(w t)
    w = args
    return jnp.stack([y[1], -(w**2) * y[0]])


class TestAccuracy:
    def test_exponential_decay(self):
        y0 = jnp.ones((4, 3)) * 2.0
        sol = odeint(exp_decay, y0, 0.0, 1.0, 1.5, rtol=1e-6, atol=1e-6)
        expected = 2.0 * np.exp(-1.5)
        np.testing.assert_allclose(np.asarray(sol.y1), expected, rtol=1e-5)
        assert bool(sol.stats.success)

    def test_oscillator_tight_tol(self):
        y0 = jnp.array([1.0, 0.0])
        w = 2.0
        sol = odeint(oscillator, y0, 0.0, 3.0, w, rtol=1e-8, atol=1e-8, max_steps=512)
        np.testing.assert_allclose(
            np.asarray(sol.y1),
            [np.cos(w * 3.0), -w * np.sin(w * 3.0)],
            atol=2e-5,  # float32 state
        )

    def test_backward_integration(self):
        # Integrate decay backwards: y(t0) from y(t1).
        y1 = jnp.array([np.exp(-1.5)], dtype=jnp.float32)
        sol = odeint(exp_decay, y1, 1.0, 0.0, 1.5, rtol=1e-7, atol=1e-7)
        np.testing.assert_allclose(np.asarray(sol.y1), 1.0, rtol=1e-5)
        assert bool(sol.stats.success)

    def test_tolerance_controls_error_and_steps(self):
        y0 = jnp.array([1.0, 0.0])
        sol_loose = odeint(oscillator, y0, 0.0, 3.0, 2.0, rtol=1e-3, atol=1e-3)
        sol_tight = odeint(oscillator, y0, 0.0, 3.0, 2.0, rtol=1e-8, atol=1e-8,
                           max_steps=512)
        assert int(sol_tight.stats.naccept) > int(sol_loose.stats.naccept)
        exact = np.array([np.cos(6.0), -2.0 * np.sin(6.0)])
        err_loose = np.abs(np.asarray(sol_loose.y1) - exact).max()
        err_tight = np.abs(np.asarray(sol_tight.y1) - exact).max()
        assert err_tight < err_loose

    def test_pytree_state(self):
        y0 = {"a": jnp.ones((2,)), "b": jnp.full((3, 2), 0.5)}

        def f(t, y, args):
            return {"a": -y["a"], "b": -2.0 * y["b"]}

        sol = odeint(f, y0, 0.0, 1.0, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sol.y1["a"]), np.exp(-1.0), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(sol.y1["b"]), 0.5 * np.exp(-2.0), rtol=1e-5
        )


class TestStats:
    def test_nfe_accounting(self):
        # destats.nf convention: 2 init evals (fsal + dt0 probe) + 6/step.
        y0 = jnp.ones((4,))
        sol = odeint(exp_decay, y0, 0.0, 1.0, 1.0, rtol=1e-6, atol=1e-6)
        nsteps = int(sol.stats.naccept) + int(sol.stats.nreject)
        assert int(sol.stats.nfe) == 2 + 6 * nsteps

    def test_fixed_dt0_single_init_eval(self):
        y0 = jnp.ones((4,))
        sol = odeint(exp_decay, y0, 0.0, 1.0, 1.0, rtol=1e-6, atol=1e-6, dt0=0.1)
        nsteps = int(sol.stats.naccept) + int(sol.stats.nreject)
        assert int(sol.stats.nfe) == 1 + 6 * nsteps

    def test_max_steps_failure_flag(self):
        y0 = jnp.ones((2,))
        sol = odeint(exp_decay, y0, 0.0, 1.0, 1.0, rtol=1e-10, atol=1e-12,
                     max_steps=3)
        assert not bool(sol.stats.success)

    def test_telemetry_accepted_dts_cover_span(self):
        y0 = jnp.ones((4,))
        sol = odeint(exp_decay, y0, 0.0, 1.0, 1.0, rtol=1e-6, atol=1e-6)
        tel = sol.telemetry
        covered = np.sum(np.asarray(tel.dt) * np.asarray(tel.accepted))
        np.testing.assert_allclose(covered, 1.0, rtol=1e-5)
        # accepted EEst <= 1, rejected > 1
        eest = np.asarray(tel.eest)
        acc = np.asarray(tel.accepted)
        live = np.asarray(tel.live)
        assert np.all(eest[acc] <= 1.0)
        assert np.all(eest[live & ~acc] > 1.0)


class TestModes:
    def test_while_matches_scan(self):
        y0 = jnp.ones((3, 2)) * 0.7
        kw = dict(rtol=1e-6, atol=1e-6, max_steps=128)
        s1 = odeint(exp_decay, y0, 0.0, 1.0, 2.0, mode="scan", **kw)
        s2 = odeint(exp_decay, y0, 0.0, 1.0, 2.0, mode="while", **kw)
        np.testing.assert_allclose(np.asarray(s1.y1), np.asarray(s2.y1), rtol=1e-7)
        assert int(s1.stats.nfe) == int(s2.stats.nfe)
        np.testing.assert_allclose(
            np.asarray(s1.telemetry.eest), np.asarray(s2.telemetry.eest), rtol=1e-6
        )

    def test_jit_and_while_inside_jit(self):
        y0 = jnp.ones((3,))

        @jax.jit
        def run(y0):
            s = odeint(exp_decay, y0, 0.0, 1.0, 1.0, rtol=1e-6, atol=1e-6,
                       mode="while")
            return s.y1, s.stats.nfe

        y1, nfe = run(y0)
        np.testing.assert_allclose(np.asarray(y1), np.exp(-1.0), rtol=1e-5)
        assert int(nfe) > 0


class TestSaveat:
    def test_dense_output_accuracy(self):
        y0 = jnp.array([1.0, 0.0])
        w = 2.0
        ts = jnp.linspace(0.0, 3.0, 17)
        sol = odeint(oscillator, y0, 0.0, 3.0, w, rtol=1e-7, atol=1e-7,
                     saveat=ts, max_steps=512)
        expected = np.stack(
            [np.cos(w * np.asarray(ts)), -w * np.sin(w * np.asarray(ts))], axis=-1
        )
        np.testing.assert_allclose(np.asarray(sol.ys), expected, atol=5e-4)

    def test_saveat_includes_endpoints(self):
        y0 = jnp.ones((2,))
        ts = jnp.array([0.0, 0.5, 1.0])
        sol = odeint(exp_decay, y0, 0.0, 1.0, 1.0, rtol=1e-7, atol=1e-7, saveat=ts)
        np.testing.assert_allclose(np.asarray(sol.ys[0]), 1.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sol.ys[-1]), np.exp(-1.0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sol.ys[1]), np.exp(-0.5), rtol=1e-4)

    def test_saveat_matches_final_state(self):
        y0 = jnp.ones((4, 2))
        ts = jnp.linspace(0.0, 1.0, 5)
        sol = odeint(exp_decay, y0, 0.0, 1.0, 1.3, rtol=1e-6, atol=1e-6, saveat=ts)
        np.testing.assert_allclose(
            np.asarray(sol.ys[-1]), np.asarray(sol.y1), rtol=1e-6
        )


class TestStiffnessEstimate:
    def test_eigen_est_tracks_decay_rate(self):
        # For y' = -k y the Jacobian eigenvalue is -k; the stage-ratio
        # estimate should be within a small factor of |k|.
        y0 = jnp.ones((8,))
        k = 40.0
        sol = odeint(exp_decay, y0, 0.0, 1.0, k, rtol=1e-5, atol=1e-5,
                     max_steps=512)
        tel = sol.telemetry
        acc = np.asarray(tel.accepted)
        est = np.asarray(tel.eigen_est)[acc]
        # skip the first couple of transient steps
        med = np.median(est[2:])
        assert 0.5 * k < med < 2.0 * k


class TestCompensatedEEst:
    """odeint(compensated_eest=True): the double-f32 estimator arithmetic
    (ops.compensated, VERDICT-r4 #3). At moderate tolerance the estimator
    noise is negligible, so the compensated solve must reproduce the
    plain solve's step sequence and trajectory; gradients (incl. through
    the EEst*dt regularizer) must stay finite and close."""

    def test_matches_plain_at_moderate_tolerance(self):
        import pytest

        from regneuralde_tpu import reg

        f = lambda t, y, a: -a * y * jnp.sin(2.0 * t + y)
        y0 = jnp.linspace(0.3, 1.2, 8).reshape(2, 4)
        kw = dict(rtol=1e-5, atol=1e-5, max_steps=128)
        for mode in ("scan", "adjoint"):
            sp = odeint(f, y0, 0.0, 1.0, 0.7, mode=mode, **kw)
            sc = odeint(f, y0, 0.0, 1.0, 0.7, mode=mode,
                        compensated_eest=True, **kw)
            assert int(sp.stats.nfe) == int(sc.stats.nfe)
            np.testing.assert_allclose(np.asarray(sp.y1),
                                       np.asarray(sc.y1),
                                       rtol=1e-6, atol=1e-7)

            def loss(a, comp):
                s = odeint(f, y0, 0.0, 1.0, a, mode=mode,
                           compensated_eest=comp, **kw)
                return (jnp.sum(s.y1 ** 2)
                        + reg.error_estimate(s.telemetry, agg="mean"))

            gp = jax.grad(lambda a: loss(a, False))(0.7)
            gc = jax.grad(lambda a: loss(a, True))(0.7)
            assert bool(jnp.isfinite(gc))
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gc),
                                       rtol=1e-3, atol=1e-6)

        with pytest.raises(ValueError, match="compensated_eest"):
            odeint(f, y0, 0.0, 1.0, 0.7, solver="rosenbrock23",
                   compensated_eest=True, **kw)

    def test_eft_identities(self):
        # The error-free transforms must satisfy their exactness
        # identities in f64 (where the residual is representable).
        from regneuralde_tpu.ops.compensated import two_prod, two_sum

        with jax.enable_x64(True):
            a = jnp.float64(1.0) + jnp.float64(2.0) ** -30
            b = jnp.float64(3.0) + jnp.float64(2.0) ** -40
            s, e = two_sum(a, b)
            assert float(s) + float(e) == float(a) + float(b)
            p, pe = two_prod(a, b)
            import math
            assert math.isclose(float(p) + float(pe),
                                float(a) * float(b), rel_tol=1e-15)
