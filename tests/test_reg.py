"""Regularization library tests: aggregation semantics and schedules."""

import jax
import jax.numpy as jnp
import numpy as np

from regneuralde_tpu import reg
from regneuralde_tpu.ops import odeint
from regneuralde_tpu.ops.ode import StepTelemetry


def _tel(eest, dt, eig, acc):
    eest = jnp.asarray(eest, jnp.float32)
    n = eest.shape[0]
    return StepTelemetry(
        t=jnp.zeros(n),
        dt=jnp.asarray(dt, jnp.float32),
        eest=eest,
        eigen_est=jnp.asarray(eig, jnp.float32),
        accepted=jnp.asarray(acc, bool),
        live=jnp.ones(n, bool),
    )


class TestAggregation:
    def test_masked_mean_ignores_rejected(self):
        tel = _tel([0.5, 2.0, 0.8], [0.1, 0.1, 0.2], [0, 0, 0],
                   [True, False, True])
        r = float(reg.error_estimate(tel, agg="mean"))
        np.testing.assert_allclose(r, (0.5 * 0.1 + 0.8 * 0.2) / 2, rtol=1e-6)

    def test_masked_max_and_sum(self):
        tel = _tel([0.5, 2.0, 0.8], [1.0, 1.0, 1.0], [3.0, 100.0, 5.0],
                   [True, False, True])
        m = float(reg.stiffness_estimate(tel, stability_size=2.0, agg="max"))
        np.testing.assert_allclose(m, 5.0 / 2.0, rtol=1e-6)
        s = float(reg.error_estimate(tel, agg="sum"))
        np.testing.assert_allclose(s, 0.5 + 0.8, rtol=1e-6)

    def test_nan_sanitized(self):
        tel = _tel([0.5, np.nan], [0.1, 0.1], [np.nan, 1.0], [True, True])
        assert np.isfinite(float(reg.error_estimate(tel)))
        assert np.isfinite(float(reg.stiffness_estimate(tel, 3.5)))

    def test_error_stiffness_combination(self):
        tel = _tel([0.5], [0.2], [7.0], [True])
        r = float(reg.error_stiffness(tel, stability_size=3.5, agg="mean"))
        np.testing.assert_allclose(r, 0.5 * 0.2 + 0.1 * 7.0 / 3.5, rtol=1e-6)

    def test_empty_mask_is_zero(self):
        tel = _tel([0.5], [0.2], [7.0], [False])
        assert float(reg.error_estimate(tel, agg="max")) == 0.0
        assert float(reg.error_estimate(tel, agg="mean")) == 0.0


class TestSchedules:
    def test_exp_decay_endpoints(self):
        sched = reg.exp_decay_schedule(1e2, 1e1, 75)
        np.testing.assert_allclose(float(sched(0)), 1e2, rtol=1e-5)
        np.testing.assert_allclose(float(sched(75)), 1e1, rtol=1e-4)

    def test_kl_anneal(self):
        sched = reg.kl_anneal_schedule()
        assert float(sched(0)) == 0.0
        assert float(sched(10)) == 0.0
        assert 0.0 < float(sched(50)) < 1.0


class TestSteer:
    def test_steer_tspan_range(self):
        keys = jax.random.split(jax.random.PRNGKey(0), 64)
        t1s = np.array([float(reg.steer_tspan(k, b=0.5)[1]) for k in keys])
        assert t1s.min() >= 0.5 - 1e-6 and t1s.max() <= 1.5 + 1e-6
        assert t1s.std() > 0.1

    def test_steer_tspan_per_sample(self):
        t0, t1s = reg.steer_tspan_per_sample(
            jax.random.PRNGKey(0), batch=64, b=0.5)
        t1s = np.asarray(t1s)
        assert t1s.shape == (64,)
        assert float(t0) == 0.0
        assert t1s.min() >= 0.5 - 1e-6 and t1s.max() <= 1.5 + 1e-6
        assert t1s.std() > 0.1  # independent draws, not one shared value

    def test_steer_saveat_keeps_first_and_bounds(self):
        ts = jnp.linspace(0.0, 1.0, 9)
        out = reg.steer_saveat(jax.random.PRNGKey(1), ts)
        out = np.asarray(out)
        assert out[0] == 0.0
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert np.abs(out[1:] - np.asarray(ts)[1:]).max() > 0

    def test_steer_saveat_per_sample(self):
        ts = jnp.linspace(0.0, 1.0, 9)
        out = np.asarray(reg.steer_saveat_per_sample(
            jax.random.PRNGKey(2), ts, batch=4))
        assert out.shape == (4, 9)
        assert (out[:, 0] == 0.0).all()
        assert out.min() >= 0.0 and out.max() <= 1.0
        # rows stay sorted (each point moves <= half the gap to its
        # predecessor) and differ across samples
        assert (np.diff(out, axis=1) >= -1e-7).all()
        assert np.abs(out[0] - out[1]).max() > 0


class TestEndToEnd:
    def test_reg_gradient_flattens_dynamics(self):
        # The paper's mechanism, unit-tested where it is deterministic: in
        # a forced-accept fixed-step regime, sum(EEst*dt) is the integrated
        # local-error density, so its gradient w.r.t. a stiffness parameter
        # must point toward flatter dynamics, and descending it must shrink
        # both the stiffness and the reg value. (The NFE reduction itself
        # emerges over full training runs and is validated at the
        # experiment level, as in the reference.)
        y0 = jnp.ones((2, 8))

        def f(t, y, logk):
            return -jnp.exp(logk) * y

        def regval(p):
            sol = odeint(f, y0, 0.0, 1.0, p, rtol=1e6, atol=1e6, dt0=0.05,
                         max_steps=32)
            return reg.error_estimate(sol.telemetry, agg="sum") * 1e6

        g = jax.jit(jax.grad(regval))
        p = jnp.asarray(np.log(50.0), jnp.float32)
        r0 = float(regval(p))
        assert float(g(p)) > 0  # points toward smaller k
        for _ in range(15):
            p = p - 0.1 * jnp.sign(g(p))
        assert float(jnp.exp(p)) < 30.0
        assert float(regval(p)) < 0.8 * r0
