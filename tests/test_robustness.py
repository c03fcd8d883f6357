"""Solver-zoo breadth and training-robustness tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from regneuralde_tpu import training as T
from regneuralde_tpu.ops import odeint


class TestDopri5:
    def test_accuracy_and_nfe(self):
        def f(t, y, k):
            return -k * y

        y0 = jnp.ones((4,)) * 2.0
        sol = odeint(f, y0, 0.0, 1.0, 1.5, solver="dopri5", rtol=1e-6,
                     atol=1e-6)
        np.testing.assert_allclose(np.asarray(sol.y1), 2.0 * np.exp(-1.5),
                                   rtol=1e-5)
        nsteps = int(sol.stats.naccept) + int(sol.stats.nreject)
        assert int(sol.stats.nfe) == 2 + 6 * nsteps

    def test_order_beats_bosh3(self):
        def f(t, y, w):
            return jnp.stack([y[1], -(w**2) * y[0]])

        y0 = jnp.array([1.0, 0.0])
        s5 = odeint(f, y0, 0.0, 3.0, 2.0, solver="dopri5", rtol=1e-7,
                    atol=1e-7, max_steps=512)
        s3 = odeint(f, y0, 0.0, 3.0, 2.0, solver="bosh3", rtol=1e-7,
                    atol=1e-7, max_steps=4096)
        assert int(s5.stats.naccept) < int(s3.stats.naccept)


class TestNanGuard:
    def test_skips_update_on_nonfinite_grads(self):
        def loss_fn(params, x):
            # Produces a NaN gradient when x flag is set.
            bad = jnp.where(x > 0, jnp.nan, 1.0)
            return jnp.sum(params["w"] ** 2) * bad, {}

        opt = optax.sgd(0.1)
        params = {"w": jnp.ones(3)}
        state = T.create_train_state(params, opt)
        step = T.make_train_step(loss_fn, opt, nan_guard=True, donate=False)

        state2, loss, aux = step(state, jnp.asarray(1.0))  # NaN grads
        assert not bool(aux["grads_finite"])
        np.testing.assert_allclose(np.asarray(state2.params["w"]), 1.0)

        state3, loss, aux = step(state2, jnp.asarray(-1.0))  # clean grads
        assert bool(aux["grads_finite"])
        assert float(jnp.abs(state3.params["w"] - 1.0).max()) > 0

    def test_opt_state_also_frozen(self):
        def loss_fn(params, x):
            bad = jnp.where(x > 0, jnp.nan, 1.0)
            return jnp.sum(params["w"] ** 2) * bad, {}

        opt = optax.adam(0.1)
        params = {"w": jnp.ones(3)}
        state = T.create_train_state(params, opt)
        step = T.make_train_step(loss_fn, opt, nan_guard=True, donate=False)
        state2, _, _ = step(state, jnp.asarray(1.0))
        # adam moments untouched by the skipped step
        for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                        jax.tree_util.tree_leaves(state2.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
