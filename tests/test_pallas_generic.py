"""Generic fused trial-step builder (ops.pallas_generic): AlternatingMLP
(latent-ODE dynamics) and FFJORD's augmented CSL dynamics.

The contract: a solve driven by the fused sweep must take the SAME
accepted/rejected step sequence as the generic XLA sweep (identical NFE),
land on the same trajectory to f32 rounding, and its vjp-traced fused
backward must match autodiff through the generic path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from regneuralde_tpu.models import (
    MLP,
    AlternatingMLP,
    CSLDynamics,
    FFJORD,
    NeuralODE,
)
from regneuralde_tpu.ops import odeint

KEY = jax.random.PRNGKey(0)


class TestAlternatingMLPFused:
    def _setup(self, batch=8, dim=6, hidden=10, depth=2):
        m = AlternatingMLP(dim=dim, hidden=hidden, depth=depth)
        y = jax.random.normal(KEY, (batch, dim)) * 0.5
        p = m.init(KEY, y)
        return m, y, p

    def test_solve_matches_generic(self):
        from regneuralde_tpu.ops.pallas_generic import make_alternating_mlp_sweep

        m, y, p = self._setup()
        f = lambda t, yy, pp: m.apply(pp, yy)
        rtol = atol = 1e-5
        sweep, _ = make_alternating_mlp_sweep(p, m.depth, rtol, atol)
        kw = dict(rtol=rtol, atol=atol, max_steps=64)
        s_gen = odeint(f, y, 0.0, 1.0, p, **kw)
        s_fus = odeint(f, y, 0.0, 1.0, p, stage_sweep=sweep, **kw)
        assert int(s_gen.stats.nfe) == int(s_fus.stats.nfe)
        np.testing.assert_allclose(
            np.asarray(s_fus.y1), np.asarray(s_gen.y1), rtol=1e-4, atol=1e-6
        )

    def test_grads_match_generic(self):
        from regneuralde_tpu.ops.pallas_generic import make_alternating_mlp_sweep

        m, y, p = self._setup()
        f = lambda t, yy, pp: m.apply(pp, yy)
        rtol = atol = 1e-4

        def loss(p, fused):
            sweep = (
                make_alternating_mlp_sweep(p, m.depth, rtol, atol)[0]
                if fused else None
            )
            sol = odeint(f, y, 0.0, 1.0, p, rtol=rtol, atol=atol,
                         max_steps=48, stage_sweep=sweep)
            reg = jnp.sum(jnp.where(sol.telemetry.accepted,
                                    sol.telemetry.eest * sol.telemetry.dt,
                                    0.0))
            return jnp.mean(sol.y1 ** 2) + 0.1 * reg

        g_fus = jax.grad(lambda p: loss(p, True))(p)
        g_gen = jax.grad(lambda p: loss(p, False))(p)
        for a, b in zip(jax.tree_util.tree_leaves(g_fus),
                        jax.tree_util.tree_leaves(g_gen)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-2, atol=5e-4
            )

    def test_neural_ode_fused_flag(self):
        m, y, p0 = self._setup()
        node = NeuralODE(m, time_dep=False, rtol=1e-4, atol=1e-4,
                         max_steps=48, fused="step")
        p = node.init(jax.random.PRNGKey(1), y)
        out = node(p, y)
        ref = NeuralODE(m, time_dep=False, rtol=1e-4, atol=1e-4,
                        max_steps=48)(p, y)
        assert int(out.nfe) == int(ref.nfe)
        np.testing.assert_allclose(np.asarray(out.value),
                                   np.asarray(ref.value), rtol=1e-4,
                                   atol=1e-6)

    def test_fused_flag_rejects_plain_mlp(self):
        with pytest.raises(ValueError, match="AlternatingMLP"):
            NeuralODE(MLP(features=(4,)), fused=True)

    def test_saveat_fast_adjoint_matches_scan(self):
        # The latent-ODE shape (reference: experiments/latent_ode.jl:225-269):
        # AlternatingMLP dynamics decoded on a saveat grid, trained through
        # the trajectory — the round-3 fast adjoint must match the scan
        # oracle in forward, NFE, and gradients.
        m, y, p0 = self._setup(batch=4, dim=6, hidden=10, depth=2)
        sa = jnp.asarray([0.0, 0.2, 0.5, 0.8, 1.0])
        node = NeuralODE(m, time_dep=False, rtol=1e-4, atol=1e-4,
                         max_steps=48, saveat=sa, fused="step")
        p = node.init(jax.random.PRNGKey(1), y)

        oa = node(p, y, mode="adjoint")
        os_ = node(p, y, mode="scan")
        assert int(oa.nfe) == int(os_.nfe)
        np.testing.assert_allclose(np.asarray(oa.value),
                                   np.asarray(os_.value),
                                   rtol=1e-5, atol=1e-7)

        def loss(p, mode):
            out = node(p, y, mode=mode)
            reg = jnp.sum(jnp.where(out.telemetry.accepted,
                                    out.telemetry.eest * out.telemetry.dt,
                                    0.0))
            w = jnp.arange(1.0, sa.shape[0] + 1.0)[None, :, None]
            return jnp.sum(w * out.value ** 2) + 0.2 * reg

        g_fast = jax.grad(lambda p: loss(p, "adjoint"))(p)
        g_scan = jax.grad(lambda p: loss(p, "scan"))(p)
        for a, b in zip(jax.tree_util.tree_leaves(g_fast),
                        jax.tree_util.tree_leaves(g_scan)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-5)


class TestCSLFFJORDFused:
    def _setup(self, batch=8, dim=3, hidden=8):
        dyn = CSLDynamics(dim=dim, hidden=hidden)
        x = jax.random.normal(KEY, (batch, dim)) * 0.5
        kw = dict(input_dim=dim, rtol=1e-4, atol=1e-4, max_steps=48,
                  analytic_vjp=True)
        ff = FFJORD(dyn, **kw)
        ff_fused = FFJORD(dyn, fused="step", **kw)
        p = ff.init(jax.random.PRNGKey(1), x)
        return ff, ff_fused, x, p

    @pytest.mark.parametrize("kinetic", [False, True])
    def test_fused_matches_unfused(self, kinetic):
        ff, ff_fused, x, p = self._setup()
        key = jax.random.PRNGKey(2)
        o_ref = ff(p, x, key, kinetic_reg=kinetic)
        o_fus = ff_fused(p, x, key, kinetic_reg=kinetic)
        assert int(o_ref.nfe) == int(o_fus.nfe)
        np.testing.assert_allclose(np.asarray(o_fus.logpx),
                                   np.asarray(o_ref.logpx), rtol=1e-4,
                                   atol=1e-5)
        if kinetic:
            np.testing.assert_allclose(np.asarray(o_fus.kinetic),
                                       np.asarray(o_ref.kinetic), rtol=1e-4,
                                       atol=1e-5)

    def test_fused_grads_match(self):
        ff, ff_fused, x, p = self._setup()
        key = jax.random.PRNGKey(2)

        def loss(model, p):
            out = model(p, x, key)
            reg = jnp.sum(jnp.where(out.telemetry.accepted,
                                    out.telemetry.eest * out.telemetry.dt,
                                    0.0))
            return -jnp.mean(out.logpx) + 0.1 * reg

        g_ref = jax.grad(lambda p: loss(ff, p))(p)
        g_fus = jax.grad(lambda p: loss(ff_fused, p))(p)
        assert float(optax.global_norm(g_ref)) > 0
        for a, b in zip(jax.tree_util.tree_leaves(g_fus),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-2, atol=5e-4
            )

    def test_fused_flag_requires_csl(self):
        with pytest.raises(ValueError, match="CSLDynamics"):
            FFJORD(MLP(features=(4,)), input_dim=4, fused=True)
