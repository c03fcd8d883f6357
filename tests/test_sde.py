"""SDE solver-core tests: deterministic reduction, moment accuracy, stats.

Validates the SRIW1/Euler-Maruyama cores against analytic moments of
geometric Brownian motion and the deterministic (zero-noise) limit, plus
the Brownian-bridge rejection machinery's distributional sanity.
"""

import jax
import jax.numpy as jnp
import numpy as np

from regneuralde_tpu.ops import sdeint


def gbm_drift(t, y, args):
    mu, _ = args
    return mu * y


def gbm_diffusion(t, y, args):
    _, sigma = args
    return sigma * y


class TestDeterministicLimit:
    def test_zero_noise_matches_ode(self):
        # With g == 0 the SRIW1 step reduces to the order-2 Ralston drift
        # pair; the adaptive trajectory must match the ODE solution.
        y0 = jnp.ones((4,)) * 1.5
        key = jax.random.PRNGKey(0)
        sol = sdeint(
            gbm_drift,
            lambda t, y, a: jnp.zeros_like(y),
            y0, 0.0, 1.0, (-1.2, 0.0),
            key=key, rtol=1e-5, atol=1e-5, max_steps=512,
        )
        np.testing.assert_allclose(
            np.asarray(sol.y1), 1.5 * np.exp(-1.2), rtol=1e-4
        )
        assert bool(sol.stats.success)

    def test_additive_noise_mean(self):
        # du = -u dt + sigma dW: E[u(T)] = u0 exp(-T) independent of sigma.
        n = 4096
        y0 = jnp.ones((1, n))
        sol = sdeint(
            lambda t, y, a: -y,
            lambda t, y, a: 0.3 * jnp.ones_like(y),
            y0, 0.0, 1.0, None,
            key=jax.random.PRNGKey(1), rtol=1e-2, atol=1e-2, max_steps=256,
        )
        mean = float(jnp.mean(sol.y1))
        # MC std of the mean ~ 0.3/sqrt(n) ~ 0.005
        assert abs(mean - np.exp(-1.0)) < 0.02


class TestMoments:
    def test_gbm_moments_sriw1(self):
        mu, sigma, T = 0.5, 0.4, 1.0
        n = 8192
        y0 = jnp.ones((1, n))
        sol = sdeint(
            gbm_drift, gbm_diffusion, y0, 0.0, T, (mu, sigma),
            key=jax.random.PRNGKey(2), rtol=1e-2, atol=1e-2, max_steps=256,
        )
        u = np.asarray(sol.y1)
        m_exact = np.exp(mu * T)
        v_exact = np.exp(2 * mu * T) * (np.exp(sigma**2 * T) - 1)
        assert abs(u.mean() - m_exact) < 4 * np.sqrt(v_exact / n) + 0.01
        assert abs(u.var() - v_exact) < 0.05 * v_exact + 4 * v_exact / np.sqrt(n)
        # Rejections should occur at this tolerance but the solve succeeds.
        assert bool(sol.stats.success)

    def test_gbm_moments_em(self):
        mu, sigma, T = 0.5, 0.4, 1.0
        n = 8192
        y0 = jnp.ones((1, n))
        sol = sdeint(
            gbm_drift, gbm_diffusion, y0, 0.0, T, (mu, sigma),
            key=jax.random.PRNGKey(3), solver="em", max_steps=200,
        )
        u = np.asarray(sol.y1)
        m_exact = np.exp(mu * T)
        v_exact = np.exp(2 * mu * T) * (np.exp(sigma**2 * T) - 1)
        assert abs(u.mean() - m_exact) < 4 * np.sqrt(v_exact / n) + 0.02
        assert abs(u.var() - v_exact) < 0.1 * v_exact + 4 * v_exact / np.sqrt(n)


class TestStatsAndSaveat:
    def test_nfe_counters(self):
        y0 = jnp.ones((2, 8))
        sol = sdeint(
            gbm_drift, gbm_diffusion, y0, 0.0, 1.0, (0.1, 0.2),
            key=jax.random.PRNGKey(4), rtol=1e-2, atol=1e-2,
        )
        nsteps = int(sol.stats.naccept) + int(sol.stats.nreject)
        # per-trial-step costs come from the tableau's static sparsity
        from regneuralde_tpu.ops import sri

        tab = sri.get_tableau("sosri")  # sdeint default
        assert int(sol.stats.nfe1) == sri.drift_evals_per_step(tab) * nsteps
        assert int(sol.stats.nfe2) == sri.diffusion_evals_per_step(tab) * nsteps

    def test_saveat_shapes_and_endpoints(self):
        y0 = jnp.ones((2, 8))
        ts = jnp.linspace(0.0, 1.0, 7)
        sol = sdeint(
            gbm_drift, gbm_diffusion, y0, 0.0, 1.0, (0.1, 0.2),
            key=jax.random.PRNGKey(5), rtol=1e-2, atol=1e-2, saveat=ts,
        )
        assert sol.ys.shape == (7, 2, 8)
        np.testing.assert_allclose(np.asarray(sol.ys[0]), 1.0)
        np.testing.assert_allclose(
            np.asarray(sol.ys[-1]), np.asarray(sol.y1), rtol=1e-6
        )

    def test_em_saveat(self):
        y0 = jnp.ones((2, 4))
        ts = jnp.linspace(0.0, 1.0, 5)
        sol = sdeint(
            gbm_drift, gbm_diffusion, y0, 0.0, 1.0, (0.1, 0.2),
            key=jax.random.PRNGKey(6), solver="em", max_steps=64, saveat=ts,
        )
        assert sol.ys.shape == (5, 2, 4)
        np.testing.assert_allclose(np.asarray(sol.ys[0]), 1.0)
        np.testing.assert_allclose(
            np.asarray(sol.ys[-1]), np.asarray(sol.y1), rtol=1e-6
        )

    def test_while_mode_runs(self):
        y0 = jnp.ones((2, 4))
        sol = sdeint(
            gbm_drift, gbm_diffusion, y0, 0.0, 1.0, (0.1, 0.2),
            key=jax.random.PRNGKey(7), rtol=1e-2, atol=1e-2, mode="while",
        )
        assert bool(sol.stats.success)
        assert np.isfinite(np.asarray(sol.y1)).all()


class TestStrongConvergence:
    def test_sriw1_beats_em_at_equal_steps(self):
        # Weak-error comparison on GBM at matched step budgets: the
        # high-order method's mean estimate should be markedly closer.
        mu, sigma, T = 1.0, 0.5, 1.0
        n = 16384
        y0 = jnp.ones((1, n))
        m_exact = np.exp(mu * T)

        em = sdeint(
            gbm_drift, gbm_diffusion, y0, 0.0, T, (mu, sigma),
            key=jax.random.PRNGKey(8), solver="em", max_steps=8,
        )
        hi = sdeint(
            gbm_drift, gbm_diffusion, y0, 0.0, T, (mu, sigma),
            key=jax.random.PRNGKey(8), solver="sriw1",
            dt0=T / 8, rtol=1e9, atol=1e9, max_steps=16,  # forced accepts
        )
        err_em = abs(float(jnp.mean(em.y1)) - m_exact)
        err_hi = abs(float(jnp.mean(hi.y1)) - m_exact)
        assert err_hi < err_em


class TestBridgeGradientGuards:
    """sqrt'(0) = inf must never reach the backward through the Brownian
    bridge. The bridge variance is EXACTLY zero whenever a step consumes
    the committed tail exactly (dt == h) — e.g. a rejected is_last trial
    leaves a tail reaching t1 and the accepted retry's final step spans
    the remainder. Regression for a NaN that poisoned whole-batch
    gradients in both the scan and adjoint engines."""

    def test_sample_increment_grad_at_exact_consumption(self):
        from regneuralde_tpu.ops.sde import _Tail, _sample_increment

        key = jax.random.PRNGKey(0)
        tail = _Tail(h=jnp.asarray(0.3, jnp.float32),
                     w=0.1 * jnp.ones(2), z=0.05 * jnp.ones(2))

        def f(dt):
            dw, dz, _, _ = _sample_increment(key, tail, dt)
            return jnp.sum(dw ** 2 + dz ** 2)

        for dt in (0.3, 0.15, 0.5):  # exact, inside, beyond
            g = jax.grad(f)(jnp.asarray(dt, jnp.float32))
            assert bool(jnp.isfinite(g)), f"dt={dt}"

    def test_stack_increment_grad_at_segment_boundary(self):
        from regneuralde_tpu.ops.sde import (
            _sample_increment_stack,
            _stack_zeros,
        )

        key = jax.random.PRNGKey(1)
        st = _stack_zeros(jnp.ones(2), depth=4, time_dtype=jnp.float32)
        st = st._replace(
            h=st.h.at[0].set(0.2).at[1].set(0.1),
            w=st.w.at[0].set(0.3).at[1].set(-0.1),
            z=st.z.at[0].set(0.05),
        )

        def f(dt):
            dw, dz, _, _ = _sample_increment_stack(key, st, dt)
            return jnp.sum(dw ** 2 + dz ** 2)

        for dt in (0.2, 0.3, 0.15, 0.4):  # boundaries, inside, beyond
            g = jax.grad(f)(jnp.asarray(dt, jnp.float32))
            assert bool(jnp.isfinite(g)), f"dt={dt}"
