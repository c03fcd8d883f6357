"""Tensor-parallel dynamics tests on a 2-D (data x model) CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from regneuralde_tpu import reg
from regneuralde_tpu.models import MLPDynamics
from regneuralde_tpu.ops import odeint
from regneuralde_tpu.parallel.tp import (
    shard_tp_params,
    split_mlp_params,
    tp_mlp_dynamics,
    tp_param_specs,
)

KEY = jax.random.PRNGKey(0)


def _mesh_2d():
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("data", "model"))


def _setup(batch=16, dim=12, hidden=8):
    m = MLPDynamics(dim=dim, hidden=hidden)
    x = jax.random.normal(KEY, (batch, dim)) * 0.5
    p = m.init(KEY, x, 0.0)
    return m, x, p


class TestTPDynamics:
    def test_tp_eval_matches_single_device(self):
        mesh = _mesh_2d()
        m, x, p = _setup()
        parts = split_mlp_params(p)
        ref = m.apply(p, x, 0.3)

        def body(x, parts):
            return tp_mlp_dynamics(0.3, x, parts)

        out = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("data", None), tp_param_specs()),
            out_specs=P("data", None),
        ))(x, parts)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-6)

    def test_tp_dp_solve_matches_single_device(self):
        # Full adaptive solve with TP dynamics + DP norms on the 2-D mesh.
        mesh = _mesh_2d()
        m, x, p = _setup()
        parts = split_mlp_params(p)

        def f_single(t, y, pp):
            return m.apply(pp, y, t)

        ref = odeint(f_single, x, 0.0, 1.0, p, rtol=1e-5, atol=1e-5,
                     max_steps=64)

        def f_tp(t, y, parts):
            return tp_mlp_dynamics(t, y, parts)

        def body(x, parts):
            sol = odeint(f_tp, x, 0.0, 1.0, parts, rtol=1e-5, atol=1e-5,
                         max_steps=64, axis_name="data")
            return sol.y1, sol.stats.nfe

        y1, nfe = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("data", None), tp_param_specs()),
            out_specs=(P("data", None), P()),
        ))(x, parts)
        assert int(nfe) == int(ref.stats.nfe)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(ref.y1),
                                   rtol=5e-5, atol=1e-5)

    def test_tp_dp_train_step_grads_match(self):
        # Gradients of a regularized NODE loss under tp x dp must match the
        # single-device gradients (loss pmean'd over both axes inside grad).
        mesh = _mesh_2d()
        m, x, p = _setup()
        parts = split_mlp_params(p)

        def loss_single(p):
            sol = odeint(lambda t, y, pp: m.apply(pp, y, t), x, 0.0, 1.0, p,
                         rtol=1e-4, atol=1e-4, max_steps=48)
            return jnp.mean(sol.y1 ** 2) + 10.0 * reg.error_estimate(sol.telemetry)

        g_ref = split_mlp_params(
            {"params": jax.grad(loss_single)(p)["params"]}
        )

        def body(x, parts):
            def gl(parts):
                sol = odeint(lambda t, y, pp: tp_mlp_dynamics(t, y, pp),
                             x, 0.0, 1.0, parts, rtol=1e-4, atol=1e-4,
                             max_steps=48, axis_name="data")
                loss = jnp.mean(sol.y1 ** 2) + 10.0 * reg.error_estimate(sol.telemetry)
                return jax.lax.pmean(jax.lax.pmean(loss, "data"), "model")

            return jax.grad(gl)(parts)

        g_tp = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("data", None), tp_param_specs()),
            out_specs=tp_param_specs(),
        ))(x, parts)

        for a, b, name in zip(g_tp, g_ref, g_tp._fields):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-4,
                err_msg=name,
            )

    def test_tp_shard_placement(self):
        mesh = _mesh_2d()
        _, _, p = _setup(dim=12, hidden=8)
        parts = shard_tp_params(mesh, split_mlp_params(p),
                                tp_param_specs())
        # column-sharded layer-1 kernel: each model shard holds H/2 cols
        shard_shapes = {s.data.shape for s in parts.w1x.addressable_shards}
        assert shard_shapes == {(12, 4)}
        shard_shapes = {s.data.shape for s in parts.w2h.addressable_shards}
        assert shard_shapes == {(4, 12)}
