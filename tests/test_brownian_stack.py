"""RSwM3-class Brownian segment stack (ops.sde._sample_increment_stack).

The collapse scheme (default) discards the committed remainder when a
rejection lands INSIDE an existing tail; the stack scheme splits the
segment instead, so every previously observed Brownian value stays
binding — the property StochasticDiffEq's RSwM3 gives the reference's
SOSRI path. These tests pin the algebra directly (scripted
accept/reject walks) and the sdeint integration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regneuralde_tpu.ops.sde import (
    _sample_increment,
    _sample_increment_stack,
    _stack_zeros,
    _Tail,
    sdeint,
)

K = 8


def _empty_stack(shape=(4,)):
    y = jnp.zeros(shape)
    return _stack_zeros(y, K, jnp.float32)


def _keys(n, seed=0):
    return jax.random.split(jax.random.PRNGKey(seed), n)


class TestStackAlgebra:
    def test_commitment_preserved_through_nested_rejections(self):
        """The defining fix: commit W over [0,1], reject into it twice,
        then accept across the whole interval in pieces — the accepted
        increments must sum back to the original commitment. (Float64:
        when a later dt lands a float-epsilon off a segment boundary,
        the bridge legitimately draws sqrt(eps)-scale fresh noise — the
        tolerance below is that scale, not a logic allowance.)"""
        with jax.enable_x64():
            ks = _keys(6, seed=1)
            st = _stack_zeros(jnp.zeros((4,), jnp.float64), K, jnp.float64)

            # Trial dt=1.0, rejected: commits segment (1.0, w_A).
            _, _, _, st = _sample_increment_stack(
                ks[0], st, jnp.float64(1.0))
            w_A = jax.tree_util.tree_map(
                lambda l: jnp.sum(l, axis=0), st.w)

            # Trial dt=0.6 inside the tail, rejected again: splits it.
            _, _, _, st = _sample_increment_stack(
                ks[1], st, jnp.float64(0.6))
            assert float(jnp.sum(st.h)) == pytest.approx(1.0, abs=1e-12)
            # Conservation: the refined segments still sum to w_A.
            np.testing.assert_allclose(
                np.asarray(jnp.sum(st.w, axis=0)), np.asarray(w_A),
                atol=1e-12)

            # Accept 0.3 + 0.3 + 0.4: the path over [0,1] is read back.
            total = jnp.zeros((4,), jnp.float64)
            for i, dt in enumerate([0.3, 0.3, 0.4]):
                dw, _, st, _ = _sample_increment_stack(
                    ks[2 + i], st, jnp.float64(dt))
                total = total + dw
            np.testing.assert_allclose(np.asarray(total), np.asarray(w_A),
                                       atol=1e-6)
            assert float(jnp.sum(st.h)) == pytest.approx(0.0, abs=1e-9)

    def test_collapse_scheme_loses_the_commitment(self):
        """The contrast case motivating the stack: the same walk under
        the collapse scheme does NOT reproduce the commitment."""
        ks = _keys(6, seed=1)
        y = jnp.zeros((4,))
        tail = _Tail(h=jnp.zeros(()), w=y, z=y)
        _, _, _, tail = _sample_increment(ks[0], tail, jnp.float32(1.0))
        w_A = tail.w
        _, _, _, tail = _sample_increment(ks[1], tail, jnp.float32(0.6))
        total = jnp.zeros((4,))
        for i, dt in enumerate([0.3, 0.3, 0.4]):
            dw, _, tail, _ = _sample_increment(
                ks[2 + i], tail, jnp.float32(dt))
            total = total + dw
        assert float(jnp.max(jnp.abs(total - w_A))) > 1e-3

    def test_matches_collapse_bitwise_without_inside_rejections(self):
        """Same keys, rejections only from the EMPTY state (where both
        schemes are exact): identical draws and identical tails."""
        ks = _keys(4, seed=3)
        st = _empty_stack()
        y = jnp.zeros((4,))
        tail = _Tail(h=jnp.zeros(()), w=y, z=y)

        # reject from empty, then accept across the whole tail, then a
        # fresh accept — no inside-tail rejection anywhere.
        script = [(1.0, False), (1.0, True), (0.5, True)]
        for k, (dt, acc) in zip(ks, script):
            dw_s, dz_s, a_s, r_s = _sample_increment_stack(
                k, st, jnp.float32(dt))
            dw_c, dz_c, a_c, r_c = _sample_increment(
                k, tail, jnp.float32(dt))
            np.testing.assert_array_equal(np.asarray(dw_s),
                                          np.asarray(dw_c))
            np.testing.assert_array_equal(np.asarray(dz_s),
                                          np.asarray(dz_c))
            st = a_s if acc else r_s
            tail = a_c if acc else r_c

    def test_invariants_random_walk(self):
        """Empties stay a suffix, lengths stay nonnegative, and the
        covered horizon evolves consistently through a random
        accept/reject walk (incl. depth overflow -> farthest merge)."""
        rng = np.random.RandomState(0)
        ks = _keys(64, seed=4)
        st = _empty_stack()
        for i in range(64):
            dt = jnp.float32(rng.uniform(0.05, 1.2))
            _, _, acc, rej = _sample_increment_stack(ks[i], st, dt)
            st = acc if rng.rand() < 0.5 else rej
            h = np.asarray(st.h)
            assert (h >= -1e-7).all()
            occupied = h > 0
            if occupied.any():
                last = np.max(np.nonzero(occupied)[0])
                assert occupied[: last + 1].all(), h

    def test_statistics_unit_variance(self):
        """Through an adversarial fixed walk (reject-inside twice, then
        accept across), the total increment over [0, 1] is N(0, 1)."""

        def one(key):
            ks = jax.random.split(key, 6)
            st = _empty_stack(shape=())
            _, _, _, st = _sample_increment_stack(ks[0], st,
                                                  jnp.float32(1.0))
            _, _, _, st = _sample_increment_stack(ks[1], st,
                                                  jnp.float32(0.55))
            _, _, _, st = _sample_increment_stack(ks[2], st,
                                                  jnp.float32(0.25))
            tot = jnp.zeros(())
            for i, dt in enumerate([0.25, 0.5, 0.25]):
                dw, _, st, _ = _sample_increment_stack(
                    ks[3 + i], st, jnp.float32(dt))
                tot = tot + dw
            return tot

        tots = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(9), 4000))
        m = float(jnp.mean(tots))
        v = float(jnp.var(tots))
        assert abs(m) < 0.06, m
        assert 0.9 < v < 1.1, v


class TestSdeintIntegration:
    def _gbm(self):
        # dY = mu Y dt + sigma Y dW: E[Y_t] = y0 exp(mu t)
        mu, sigma = 0.7, 0.4
        drift = lambda t, y, a: mu * y
        diffusion = lambda t, y, a: sigma * y
        return drift, diffusion, mu, sigma

    def test_stack_mode_moments(self):
        drift, diffusion, mu, _ = self._gbm()
        y0 = jnp.ones((4096, 1))
        sol = sdeint(drift, diffusion, y0, 0.0, 1.0, None,
                     key=jax.random.PRNGKey(0), rtol=1e-2, atol=1e-2,
                     max_steps=128, brownian="stack")
        assert bool(sol.stats.success)
        mean = float(jnp.mean(sol.y1))
        assert abs(mean - np.exp(mu)) / np.exp(mu) < 0.05

    def test_stack_equals_collapse_when_no_rejections(self):
        """At loose tolerance the controller accepts every step, so the
        two schemes must produce bitwise identical solves."""
        drift, diffusion, _, _ = self._gbm()
        y0 = jnp.ones((64, 2))
        kw = dict(key=jax.random.PRNGKey(1), rtol=0.5, atol=0.5,
                  max_steps=64)
        a = sdeint(drift, diffusion, y0, 0.0, 1.0, None,
                   brownian="stack", **kw)
        b = sdeint(drift, diffusion, y0, 0.0, 1.0, None,
                   brownian="collapse", **kw)
        assert int(a.stats.nreject) == 0
        assert bool(jnp.all(a.y1 == b.y1))
        assert int(a.stats.naccept) == int(b.stats.naccept)

    def test_stack_mode_gradients(self):
        drift = lambda t, y, a: -a * y
        diffusion = lambda t, y, a: 0.2 * y

        def loss(a, brownian):
            sol = sdeint(drift, diffusion, jnp.ones((32, 2)), 0.0, 1.0, a,
                         key=jax.random.PRNGKey(2), rtol=1e-2, atol=1e-2,
                         max_steps=96, mode="scan", brownian=brownian)
            return jnp.mean(sol.y1 ** 2)

        g_stack = jax.grad(lambda a: loss(a, "stack"))(0.8)
        g_coll = jax.grad(lambda a: loss(a, "collapse"))(0.8)
        assert np.isfinite(float(g_stack))
        # Same mechanism, slightly different sampled paths where
        # rejections nest — gradients agree to leading order.
        assert abs(float(g_stack) - float(g_coll)) < 0.3 * abs(
            float(g_coll)) + 1e-3

    def test_adjoint_mode_rejects_stack(self):
        drift = lambda t, y, a: -y
        diffusion = lambda t, y, a: 0.1 * y
        with pytest.raises(ValueError, match="stack"):
            sdeint(drift, diffusion, jnp.ones((4, 2)), 0.0, 1.0, None,
                   key=jax.random.PRNGKey(0), mode="adjoint",
                   brownian="stack")

    def test_unknown_brownian_rejected(self):
        drift = lambda t, y, a: -y
        diffusion = lambda t, y, a: 0.1 * y
        with pytest.raises(ValueError, match="brownian"):
            sdeint(drift, diffusion, jnp.ones((4, 2)), 0.0, 1.0, None,
                   key=jax.random.PRNGKey(0), brownian="rswm9")
