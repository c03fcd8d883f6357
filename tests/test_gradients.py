"""Gradient-correctness tests: discrete adjoint through the adaptive solver.

The reference's gradient semantics is "backprop through the solver": the
Tracker tape records every array op of the integrator run, including the
controller arithmetic, so gradients flow through ``EEst`` and ``dt`` into
the dynamics parameters and the timespan (reference:
src/models/neural_ode.jl:67 SensitivityADPassThrough; src/utils.jl:21-23
puts tspan on the tape deliberately). Here the same semantics falls out of
``jax.grad`` over the bounded-scan solve. These tests check gradients of

  * terminal-state losses,
  * the ``EEst * dt`` solver-heuristic regularizer itself,
  * saveat trajectories,
  * SDE solves (drift/diffusion params),

against central finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np

from regneuralde_tpu.ops import odeint, sdeint


def _fd_grad(f, x, eps=1e-3):
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        idx = it.multi_index
        xp = x.copy(); xp[idx] += eps
        xm = x.copy(); xm[idx] -= eps
        g[idx] = (f(jnp.asarray(xp, jnp.float32)) - f(jnp.asarray(xm, jnp.float32))) / (2 * eps)
        it.iternext()
    return g


def linear_dynamics(t, y, p):
    # y' = A y with A = p reshaped; tiny but nonlinear-in-params enough.
    A = p.reshape(2, 2)
    return A @ y


class TestODEGradients:
    def test_terminal_loss_grad_matches_fd(self):
        y0 = jnp.array([1.0, 0.5])
        p0 = jnp.array([-0.5, 0.2, -0.1, -0.8])

        def loss(p):
            sol = odeint(linear_dynamics, y0, 0.0, 1.0, p, rtol=1e-6, atol=1e-6,
                         max_steps=64)
            return jnp.sum(sol.y1**2)

        g = np.asarray(jax.grad(loss)(p0))
        g_fd = _fd_grad(lambda p: float(loss(p)), p0)
        np.testing.assert_allclose(g, g_fd, rtol=2e-2, atol=2e-3)

    def test_reg_term_grad_matches_fd(self):
        # The ICML'21 regularizer: mean over accepted steps of EEst*dt.
        # EEst is a catastrophic-cancellation quantity (a ~1e-4 residual of
        # O(1) stage combinations), so in float32 its value carries
        # deterministic roundoff texture that swamps finite differences;
        # the FD comparison therefore runs in float64, while float32 is
        # checked for finite, nonzero gradient flow.
        enable_x64 = jax.enable_x64

        def make_reg(dtype):
            y0 = jnp.array([1.0, 0.5], dtype)

            def reg(p):
                sol = odeint(linear_dynamics, y0, jnp.asarray(0.0, dtype),
                             jnp.asarray(1.0, dtype), p, rtol=1e-4, atol=1e-4,
                             max_steps=64)
                tel = sol.telemetry
                m = tel.accepted
                return jnp.sum(tel.eest * tel.dt * m) / jnp.maximum(jnp.sum(m), 1)

            return reg

        p32 = jnp.array([-0.5, 1.2, -1.1, -0.8], jnp.float32)
        g32 = np.asarray(jax.grad(make_reg(jnp.float32))(p32))
        assert np.isfinite(g32).all()
        assert np.abs(g32).max() > 0  # grads really flow through EEst and dt

        with enable_x64():
            reg64 = make_reg(jnp.float64)
            p64 = jnp.array([-0.5, 1.2, -1.1, -0.8], jnp.float64)
            g = np.asarray(jax.grad(reg64)(p64))
            # Reverse mode must agree with forward mode (independent
            # differentiation path through the scan) to near machine
            # precision; this is the strongest available oracle because the
            # controller's feedback loop gives the reg term curvature too
            # large for finite differences to converge (FD error floors at
            # a few percent at its optimal eps).
            g_fwd = np.array([
                float(jax.jvp(reg64, (p64,), (jnp.eye(4, dtype=jnp.float64)[i],))[1])
                for i in range(4)
            ])
            np.testing.assert_allclose(g, g_fwd, rtol=5e-6, atol=1e-14)
            # FD sanity anchor at the U-curve optimum.
            eps = 1e-5
            g_fd = np.zeros(4)
            for i in range(4):
                pp = np.asarray(p64).copy(); pp[i] += eps
                pm = np.asarray(p64).copy(); pm[i] -= eps
                g_fd[i] = (float(reg64(jnp.asarray(pp))) -
                           float(reg64(jnp.asarray(pm)))) / (2 * eps)
        np.testing.assert_allclose(g, g_fd, rtol=0.3, atol=3e-6)

    def test_grad_wrt_initial_state(self):
        p0 = jnp.array([-0.5, 0.2, -0.1, -0.8])

        def loss(y0):
            sol = odeint(linear_dynamics, y0, 0.0, 1.0, p0, rtol=1e-6, atol=1e-6,
                         max_steps=64)
            return jnp.sum(sol.y1**2)

        y0 = jnp.array([1.0, 0.5])
        g = np.asarray(jax.grad(loss)(y0))
        g_fd = _fd_grad(lambda y: float(loss(y)), y0)
        np.testing.assert_allclose(g, g_fd, rtol=2e-2, atol=2e-3)

    def test_grad_through_saveat_trajectory(self):
        p0 = jnp.array([-0.5, 0.2, -0.1, -0.8])
        ts = jnp.linspace(0.0, 1.0, 5)
        y0 = jnp.array([1.0, 0.5])

        def loss(p):
            sol = odeint(linear_dynamics, y0, 0.0, 1.0, p, rtol=1e-6, atol=1e-6,
                         saveat=ts, max_steps=64)
            return jnp.sum(sol.ys**2)

        g = np.asarray(jax.grad(loss)(p0))
        g_fd = _fd_grad(lambda p: float(loss(p)), p0)
        np.testing.assert_allclose(g, g_fd, rtol=2e-2, atol=2e-3)

    def test_grad_wrt_t1_steer(self):
        # STEER samples t1 ~ U(1-b, 1+b) (reference:
        # experiments/mnist_node.jl:104-105); t1 stays differentiable.
        p0 = jnp.array([-0.5, 0.2, -0.1, -0.8])
        y0 = jnp.array([1.0, 0.5])

        def loss(t1):
            sol = odeint(linear_dynamics, y0, 0.0, t1, p0, rtol=1e-6, atol=1e-6,
                         max_steps=64)
            return jnp.sum(sol.y1**2)

        g = float(jax.grad(loss)(jnp.asarray(0.9)))
        f = lambda t: float(loss(jnp.asarray(t, jnp.float32)))
        g_fd = (f(0.9 + 1e-3) - f(0.9 - 1e-3)) / 2e-3
        np.testing.assert_allclose(g, g_fd, rtol=2e-2, atol=1e-3)

    def test_remat_off_matches_on(self):
        p0 = jnp.array([-0.5, 0.2, -0.1, -0.8])
        y0 = jnp.array([1.0, 0.5])

        def make_loss(remat):
            def loss(p):
                sol = odeint(linear_dynamics, y0, 0.0, 1.0, p, rtol=1e-6,
                             atol=1e-6, max_steps=64, remat=remat)
                return jnp.sum(sol.y1**2)
            return loss

        g1 = np.asarray(jax.grad(make_loss(True))(p0))
        g2 = np.asarray(jax.grad(make_loss(False))(p0))
        np.testing.assert_allclose(g1, g2, rtol=1e-5)


class TestSDEGradients:
    def test_sde_grad_matches_fd_same_key(self):
        # With a fixed key the Brownian path is a deterministic function of
        # the step sequence; at fixed accept/reject pattern the loss is
        # differentiable in the drift params.
        y0 = jnp.ones((2, 4))
        key = jax.random.PRNGKey(0)

        def loss(p):
            sol = sdeint(
                lambda t, y, pp: pp * y,
                lambda t, y, pp: 0.1 * y,
                y0, 0.0, 1.0, p,
                key=key, rtol=1e-2, atol=1e-2, max_steps=64,
            )
            return jnp.mean(sol.y1)

        p0 = jnp.asarray(0.4)
        g = float(jax.grad(loss)(p0))
        eps = 1e-3
        g_fd = (float(loss(p0 + eps)) - float(loss(p0 - eps))) / (2 * eps)
        np.testing.assert_allclose(g, g_fd, rtol=5e-2, atol=1e-3)

    def test_sde_reg_grad_finite(self):
        y0 = jnp.ones((2, 4))
        key = jax.random.PRNGKey(1)

        def reg(p):
            sol = sdeint(
                lambda t, y, pp: pp * y,
                lambda t, y, pp: 0.2 * y,
                y0, 0.0, 1.0, p,
                key=key, rtol=1e-2, atol=1e-2, max_steps=64,
            )
            tel = sol.telemetry
            m = tel.accepted
            return jnp.sum(tel.eest * tel.dt * m) / jnp.maximum(jnp.sum(m), 1)

        g = float(jax.grad(reg)(jnp.asarray(0.4)))
        assert np.isfinite(g)
