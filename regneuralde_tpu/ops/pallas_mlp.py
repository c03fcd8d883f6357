"""Fused Tsit5 trial step for time-dependent 2-layer MLP dynamics (Pallas).

The hot loop of the flagship MNIST Neural-ODE (reference dynamics:
experiments/mnist_node.jl:41-54) evaluates a small tanh MLP six times per
trial step with stage linear-combinations between evaluations. Plain XLA
materializes every stage state and derivative in HBM (~15 batch-size
arrays per step); this kernel performs the ENTIRE trial step — all six
stage lincombs, both matmuls per stage with the time-row folded in, tanh
activations, and the regrouped embedded-error combination — in one
VMEM-resident pass per batch tile (one HBM read of y/k1/weights, one write
of the five outputs).

Gradients: the kernel carries a ``jax.custom_vjp`` whose backward pass
differentiates an algebraically identical plain-XLA recompute — forward
speed from Pallas, reverse-mode correctness from XLA autodiff (the two
paths agree to float32 rounding).

Outputs (matching the solver's ``stage_sweep`` contract in ``ops.ode``):
  (y_new, k7, err, k6, g6)
where ``err = dt * sum(btilde_i (k_i - k1))`` and (k6, g6) feed the
stiffness estimate ``|eigen_est| = |k7-k6| / |g7-g6|``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from regneuralde_tpu.ops.tableaus import TSIT5


def _mlp_k(yi, ti, w1x, w1t, b1, w2h, w2t, b2):
    """k = tanh( [tanh([yi, ti] @ W1 + b1), ti] @ W2 + b2 ) with the time
    row folded into rank-1 updates (w1t/w2t are the t-rows of the concat
    kernels)."""
    pre1 = (
        jnp.dot(yi, w1x, preferred_element_type=jnp.float32) + ti * w1t + b1
    )
    h = jnp.tanh(pre1)
    pre2 = (
        jnp.dot(h, w2h, preferred_element_type=jnp.float32) + ti * w2t + b2
    )
    return jnp.tanh(pre2)


def _fused_step_kernel(
    t_ref, dt_ref,  # SMEM scalars (1, 1)
    y_ref, k1_ref,  # (Bt, D) VMEM
    w1x_ref, w1t_ref, b1_ref, w2h_ref, w2t_ref, b2_ref,
    ynew_ref, k7_ref, err_ref, k6_ref, g6_ref,
):
    tab = TSIT5
    t = t_ref[0, 0]
    dt = dt_ref[0, 0]
    y = y_ref[:]
    w1x = w1x_ref[:]
    w1t = w1t_ref[:]
    b1 = b1_ref[:]
    w2h = w2h_ref[:]
    w2t = w2t_ref[:]
    b2 = b2_ref[:]

    ks = [k1_ref[:]]
    y_stage = y
    for i in range(1, 7):
        acc = tab.a[i - 1][0] * ks[0]
        for c, k in zip(tab.a[i - 1][1:], ks[1:]):
            if c != 0.0:
                acc = acc + c * k
        y_stage = y + dt * acc
        ti = t + tab.c[i] * dt
        ks.append(_mlp_k(y_stage, ti, w1x, w1t, b1, w2h, w2t, b2))
        if i == 5:
            g6_ref[:] = y_stage
        if i == 6 - 1:
            k6_ref[:] = ks[-1]

    ynew_ref[:] = y_stage  # b row == last a row (FSAL)
    k7_ref[:] = ks[-1]
    err = tab.btilde[1] * (ks[1] - ks[0])
    for c, k in zip(tab.btilde[2:], ks[2:]):
        err = err + c * (k - ks[0])
    err_ref[:] = dt * err


def _split_params(params) -> Tuple[jnp.ndarray, ...]:
    """Split the flax MLPDynamics params into (W1x, w1t, b1, W2h, w2t, b2).

    The concat-time layout puts the t row LAST in each kernel
    (models.basic.MLPDynamics concatenates ``[x, t]``)."""
    p = params["params"]
    k1 = p["dense_1"]["kernel"]
    k2 = p["dense_2"]["kernel"]
    return (
        k1[:-1, :],
        k1[-1:, :],
        p["dense_1"]["bias"][None, :],
        k2[:-1, :],
        k2[-1:, :],
        p["dense_2"]["bias"][None, :],
    )


def _reference_sweep(t, dt, y, k1, parts):
    """Plain-XLA recompute of the kernel (used for the backward pass and
    for interpret-mode testing)."""
    tab = TSIT5
    w1x, w1t, b1, w2h, w2t, b2 = parts
    ks = [k1]
    y_stage = y
    for i in range(1, 7):
        acc = sum(c * k for c, k in zip(tab.a[i - 1], ks) if c != 0.0)
        y_stage = y + dt * acc
        ti = t + tab.c[i] * dt
        ks.append(_mlp_k(y_stage, ti, w1x, w1t, b1, w2h, w2t, b2))
        if i == 5:
            g6 = y_stage
    y_new = y_stage
    err = dt * sum(
        c * (k - ks[0]) for c, k in zip(tab.btilde[1:], ks[1:])
    )
    return y_new, ks[-1], err, ks[-2], g6


def _pallas_sweep(t, dt, y, k1, parts, block_batch: int = 128):
    batch, dim = y.shape
    bt = min(block_batch, batch)
    grid = (pl.cdiv(batch, bt),)
    w1x, w1t, b1, w2h, w2t, b2 = parts
    hidden = w1x.shape[1]

    t2 = jnp.reshape(t.astype(jnp.float32), (1, 1))
    dt2 = jnp.reshape(dt.astype(jnp.float32), (1, 1))

    row_spec = pl.BlockSpec((bt, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _fused_step_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            row_spec,
            row_spec,
            full((dim, hidden)),
            full((1, hidden)),
            full((1, hidden)),
            full((hidden, dim)),
            full((1, dim)),
            full((1, dim)),
        ],
        out_specs=[row_spec] * 5,
        out_shape=[jax.ShapeDtypeStruct((batch, dim), y.dtype)] * 5,
        interpret=jax.default_backend() == "cpu",
    )(t2, dt2, y, k1, w1x, w1t, b1, w2h, w2t, b2)
    return tuple(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused_step(t, dt, y, k1, parts):
    return _pallas_sweep(t, dt, y, k1, parts)


def _fused_step_fwd(t, dt, y, k1, parts):
    return _pallas_sweep(t, dt, y, k1, parts), (t, dt, y, k1, parts)


def _fused_step_bwd(residuals, cotangents):
    t, dt, y, k1, parts = residuals
    _, vjp_fn = jax.vjp(_reference_sweep, t, dt, y, k1, parts)
    return vjp_fn(cotangents)


_fused_step.defvjp(_fused_step_fwd, _fused_step_bwd)


def mlp_dynamics_stage_sweep(t, dt, y, k1, params):
    """``stage_sweep`` implementation for ``ops.ode.odeint``: the fused
    Pallas Tsit5 trial step over ``models.basic.MLPDynamics`` params.

    Usage::

        node = NeuralODE(MLPDynamics(...), ...)
        sweep = lambda t, dt, y, f0, p: mlp_dynamics_stage_sweep(t, dt, y, f0, p)
        sol = odeint(node._func, x, t0, t1, params, stage_sweep=sweep, ...)
    """
    return _fused_step(t, dt, y, k1, _split_params(params))
