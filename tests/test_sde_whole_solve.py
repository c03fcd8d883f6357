"""Whole-solve fused SDE kernel tests (ops.pallas_sde, interpret mode).

Contract: the fused SRI solve must reproduce ``ops.sde.sdeint``'s scan
engine draw-for-draw — the presampled noise follows the same key chain,
so the accepted/rejected step sequence, trajectory, telemetry, and
gradients (through the bridge's dt-dependence, the embedded error, and
the controller) all match the scan oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regneuralde_tpu import reg
from regneuralde_tpu.models import MLP, NeuralSDE
from regneuralde_tpu.ops.pallas_sde import (
    vmem_estimate_sde,
    whole_solve_sdeint,
)
from regneuralde_tpu.ops.sde import sdeint

KEY = jax.random.PRNGKey(0)
BKEY = jax.random.PRNGKey(7)


def _setup(batch=16, dim=4):
    drift_m = MLP(features=(8, dim))
    diff_m = MLP(features=(dim,))
    y = jax.random.normal(KEY, (batch, dim)) * 0.4
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    p = {"drift": drift_m.init(k1, y), "diffusion": diff_m.init(k2, y)}
    drift = lambda t, yy, pp: drift_m.apply(pp["drift"], yy)
    diffusion = lambda t, yy, pp: 0.2 * diff_m.apply(pp["diffusion"], yy)
    return y, p, drift, diffusion


SA = jnp.asarray([0.0, 0.3, 0.6, 1.0])
KW = dict(solver="sosri", rtol=1e-2, atol=1e-2, max_steps=64)


class TestSDEWholeSolve:
    @pytest.mark.parametrize("saveat", [None, SA], ids=["final", "saveat"])
    def test_forward_matches_scan(self, saveat):
        y, p, drift, diffusion = _setup()
        ws = whole_solve_sdeint(drift, diffusion, y, 0.0, 1.0, p,
                                key=BKEY, saveat=saveat, **KW)
        ref = sdeint(drift, diffusion, y, 0.0, 1.0, p, key=BKEY,
                     saveat=saveat, mode="scan", **KW)
        assert int(ws.stats.naccept) == int(ref.stats.naccept)
        assert int(ws.stats.nreject) == int(ref.stats.nreject)
        assert int(ws.stats.nfe1) == int(ref.stats.nfe1)
        assert bool(ws.stats.success)
        np.testing.assert_allclose(np.asarray(ws.y1), np.asarray(ref.y1),
                                   rtol=1e-5, atol=1e-6)
        if saveat is not None:
            np.testing.assert_allclose(np.asarray(ws.ys),
                                       np.asarray(ref.ys),
                                       rtol=1e-5, atol=1e-6)
        live = np.asarray(ref.telemetry.live)
        np.testing.assert_array_equal(np.asarray(ws.telemetry.live), live)
        np.testing.assert_allclose(
            np.asarray(ws.telemetry.eest)[live],
            np.asarray(ref.telemetry.eest)[live], rtol=1e-4, atol=1e-7)

    def test_rejections_taken_identically(self):
        # Drive a rejection-heavy solve (tight tolerance, rough noise)
        # and require the exact accept/reject sequence of the oracle —
        # the bridge tail commit/resample logic must agree step-for-step.
        y, p, drift, diffusion = _setup()
        kw = dict(solver="sosri", rtol=2e-3, atol=2e-3, max_steps=128)
        ws = whole_solve_sdeint(drift, diffusion, y, 0.0, 1.0, p,
                                key=BKEY, **kw)
        ref = sdeint(drift, diffusion, y, 0.0, 1.0, p, key=BKEY,
                     mode="scan", **kw)
        assert int(ref.stats.nreject) > 0, "test needs rejections"
        live = np.asarray(ref.telemetry.live)
        np.testing.assert_array_equal(
            np.asarray(ws.telemetry.accepted)[live],
            np.asarray(ref.telemetry.accepted)[live])
        np.testing.assert_allclose(np.asarray(ws.y1), np.asarray(ref.y1),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("saveat", [None, SA], ids=["final", "saveat"])
    def test_grads_match_scan(self, saveat):
        y, p, drift, diffusion = _setup()

        def value(s):
            return s.ys if saveat is not None else s.y1

        def loss_ws(p):
            s = whole_solve_sdeint(drift, diffusion, y, 0.0, 1.0, p,
                                   key=BKEY, saveat=saveat, **KW)
            return (jnp.sum(value(s) ** 2)
                    + 10.0 * reg.error_estimate(s.telemetry, agg="mean"))

        def loss_ref(p):
            s = sdeint(drift, diffusion, y, 0.0, 1.0, p, key=BKEY,
                       saveat=saveat, mode="scan", **KW)
            return (jnp.sum(value(s) ** 2)
                    + 10.0 * reg.error_estimate(s.telemetry, agg="mean"))

        g1 = jax.grad(loss_ws)(p)
        g2 = jax.grad(loss_ref)(p)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-5)

    def test_x0_grads(self):
        y, p, drift, diffusion = _setup()
        gx = jax.grad(lambda x: jnp.sum(whole_solve_sdeint(
            drift, diffusion, x, 0.0, 1.0, p, key=BKEY, **KW).y1 ** 2))(y)
        gr = jax.grad(lambda x: jnp.sum(sdeint(
            drift, diffusion, x, 0.0, 1.0, p, key=BKEY, mode="scan",
            **KW).y1 ** 2))(y)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                                   rtol=2e-3, atol=1e-5)

    def test_starved_max_steps_reports_failure(self):
        y, p, drift, diffusion = _setup()
        s = whole_solve_sdeint(drift, diffusion, y, 0.0, 1.0, p, key=BKEY,
                               solver="sosri", rtol=1e-5, atol=1e-5,
                               max_steps=3)
        assert not bool(s.stats.success)
        assert np.isfinite(np.asarray(s.y1)).all()


class TestNeuralSDERouting:
    def test_fused_auto_routes_and_matches(self):
        from regneuralde_tpu.ops import pallas_sde as psde

        drift_m = MLP(features=(8, 4))
        diff_m = MLP(features=(4,))
        nsde_f = NeuralSDE(drift_m, diff_m, solver="sosri", rtol=1e-2,
                           atol=1e-2, max_steps=64, fused=True)
        nsde = NeuralSDE(drift_m, diff_m, solver="sosri", rtol=1e-2,
                         atol=1e-2, max_steps=64)
        x = jax.random.normal(KEY, (16, 4)) * 0.4
        p = nsde.init(jax.random.PRNGKey(1), x)

        calls = []
        orig = psde.whole_solve_sdeint

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        psde.whole_solve_sdeint = spy
        try:
            o1 = nsde_f(p, x, BKEY, mode="adjoint")
        finally:
            psde.whole_solve_sdeint = orig
        assert calls, "fused=True did not route to the SDE whole-solve"
        o2 = nsde(p, x, BKEY, mode="scan")
        assert int(o1.nfe1) == int(o2.nfe1)
        assert int(o1.nfe2) == int(o2.nfe2)
        np.testing.assert_allclose(np.asarray(o1.value),
                                   np.asarray(o2.value),
                                   rtol=1e-5, atol=1e-6)

    def test_vmem_gate(self):
        assert vmem_estimate_sde(512, 32) <= 12 * 2**20
        assert vmem_estimate_sde(65536, 128) > 12 * 2**20

    def test_bad_fused_value_raises(self):
        with pytest.raises(ValueError, match="fused"):
            NeuralSDE(MLP(features=(4,)), MLP(features=(4,)),
                      fused="tiled")
