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

Gradients: the kernel carries a ``jax.custom_vjp`` whose backward pass is
a second fused Pallas kernel — it recomputes the six stages in VMEM and
runs the reverse chain (transposed contractions, tanh derivatives,
stage-lincomb transposes, scalar (t, dt) reductions) in the same pass,
accumulating weight cotangents across batch tiles. A plain-XLA
``_reference_sweep`` of identical algebra is kept for interpret-mode tests
and as the correctness oracle.

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

from regneuralde_tpu.ops.math import tanh as _tanh
from regneuralde_tpu.ops.tableaus import TSIT5

# In-kernel MXU precision. HIGHEST (6-pass f32-accurate) is REQUIRED for
# training: the embedded error estimate is a 5th-order cancellation and
# lower precision floors it at rtol=1.4e-8 (see BASELINE.md round-2
# numerics notes). REGNDE_DOT_PRECISION exists ONLY for perf probes
# (tools/ablate_wholesolve.py) that measure the matmul-pass count's share
# of kernel time; never set it in training or tests.
import os as _os

_DOT_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}[_os.environ.get("REGNDE_DOT_PRECISION", "highest")]


def _mlp_k(yi, ti, w1x, w1t, b1, w2h, w2t, b2):
    """k = tanh( [tanh([yi, ti] @ W1 + b1), ti] @ W2 + b2 ) with the time
    row folded into rank-1 updates (w1t/w2t are the t-rows of the concat
    kernels). Uses the accurate exp-based tanh (ops.math) — the native TPU
    tanh approximation would floor the embedded error estimate."""
    pre1 = (
        jnp.dot(yi, w1x, preferred_element_type=jnp.float32,
                precision=_DOT_PRECISION) + ti * w1t + b1
    )
    h = _tanh(pre1)
    pre2 = (
        jnp.dot(h, w2h, preferred_element_type=jnp.float32,
                precision=_DOT_PRECISION) + ti * w2t + b2
    )
    return _tanh(pre2)


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


def _vma_struct(shape, dtype, like):
    """ShapeDtypeStruct carrying the varying-mesh-axes of ``like`` so
    pallas_call composes with shard_map's vma checking (the kernel's
    outputs vary over exactly the axes its row inputs do)."""
    vma = getattr(jax.typeof(like), "vma", None)
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _vma_axes(like) -> tuple:
    return tuple(sorted(getattr(jax.typeof(like), "vma", frozenset()) or ()))


def _pvary_like(like, *arrays):
    """Promote replicated (mesh-invariant) kernel inputs — weights, the
    scalar t/dt, scalar cotangents — to the varying-mesh-axes of ``like``
    (the sharded row input) so every in-kernel op sees uniform vma under
    shard_map. ``pvary``'s transpose is a psum, which is exactly the
    correct adjoint for a replicated input."""
    axes = _vma_axes(like)
    if not axes:
        return arrays
    out = []
    for a in arrays:
        have = getattr(jax.typeof(a), "vma", frozenset())
        need = tuple(ax for ax in axes if ax not in have)
        out.append(jax.lax.pvary(a, need) if need else a)
    return tuple(out)


def _psum_cts(like, *arrays):
    """Reduce per-shard cotangents of replicated primals (weights, t, dt)
    to the invariant total — the adjoint of replication."""
    axes = _vma_axes(like)
    if not axes:
        return arrays
    return tuple(jax.lax.psum(a, axes) for a in arrays)


def fused_tiling_ok(batch: int, target: int = 128) -> bool:
    """Whether ``_pick_block`` can legally tile ``batch``.

    An 8-divisible divisor of ``batch`` exists iff ``batch % 8 == 0``
    (8 itself is then a divisor); otherwise the only legal layout is one
    whole-batch block, acceptable up to ``max(2 * target, 256)`` rows.
    Model layers gate fused routing on this and fall back to the unfused
    engines (e.g. an eval loop's partial final batch) instead of erroring
    deep in the kernel."""
    return batch % 8 == 0 or batch <= max(2 * target, 256)


def _pick_block(batch: int, target: int = 128) -> int:
    """Largest 8-divisible divisor of ``batch`` not exceeding ``target``.

    Tiles must cover the batch exactly (the backward kernel reduces over
    tile rows; padded rows would pollute the weight cotangents), and the
    Pallas TPU lowering requires the sublane block dim be divisible by 8
    OR equal to the full array dim — so when no 8-divisible divisor
    exists (odd/partial batches), fall back to one whole-batch block.
    That fallback is only safe while the whole batch fits the ~16MB
    scoped-VMEM budget, so large 8-indivisible batches are rejected with
    a clear error instead of failing deep inside the Mosaic compiler."""
    for b in range(min(target, batch), 0, -1):
        if batch % b == 0 and b % 8 == 0:
            return b
    if batch > max(2 * target, 256):
        raise ValueError(
            f"fused kernels tile the batch in 8-divisible blocks <= {target};"
            f" batch={batch} has no such divisor and is too large for one"
            " whole-batch VMEM block — pad the batch to a multiple of 8 or"
            " construct the model with fused=False"
        )
    return batch


def _interpret_under_shard_map(y) -> bool:
    """Pallas's CPU interpreter cannot evaluate kernels whose operands
    carry varying-mesh-axes (its internal grid loop mixes vma'd and
    invariant operands). Under a CPU-mesh shard_map, fall back to the
    plain-XLA reference algebra — bitwise-equivalent semantics, verified
    by tests; compiled TPU kernels declare vma properly and don't need
    the fallback."""
    return jax.default_backend() == "cpu" and bool(_vma_axes(y))


def _pallas_sweep(t, dt, y, k1, parts, block_batch: int = 128):
    if _interpret_under_shard_map(y):
        return _reference_sweep(t, dt, y, k1, parts)
    batch, dim = y.shape
    bt = _pick_block(batch, block_batch)
    grid = (pl.cdiv(batch, bt),)
    w1x, w1t, b1, w2h, w2t, b2 = parts
    hidden = w1x.shape[1]

    t2 = jnp.reshape(t.astype(jnp.float32), (1, 1))
    dt2 = jnp.reshape(dt.astype(jnp.float32), (1, 1))
    (t2, dt2, w1x, w1t, b1, w2h, w2t, b2) = _pvary_like(
        y, t2, dt2, w1x, w1t, b1, w2h, w2t, b2)

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
        out_shape=[_vma_struct((batch, dim), y.dtype, y)] * 5,
        interpret=jax.default_backend() == "cpu",
    )(t2, dt2, y, k1, w1x, w1t, b1, w2h, w2t, b2)
    return tuple(out)


def _fused_bwd_kernel(
    t_ref, dt_ref,  # SMEM scalars (1, 1)
    y_ref, k1_ref,
    w1x_ref, w1t_ref, b1_ref, w2h_ref, w2t_ref, b2_ref,
    cyn_ref, ck7_ref, cerr_ref, ck6_ref, cg6_ref,
    # outputs
    cy_ref, ck1_ref,
    cw1x_ref, cw1t_ref, cb1_ref, cw2h_ref, cw2t_ref, cb2_ref,
    ct_ref, cdt_ref,
):
    """Fused backward: recompute the six stages in VMEM, then run the
    reverse chain — transposed matmuls, tanh derivatives, stage-lincomb
    transposes, and the scalar (t, dt) reductions — in the same kernel.
    Weight/scalar cotangents accumulate across batch-tile grid steps
    (sequential revisiting on TPU)."""
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

    # ---- forward recompute, keeping stage values live in VMEM ----
    ks = [k1_ref[:]]
    yis, hs = [], []
    for i in range(1, 7):
        acc = tab.a[i - 1][0] * ks[0]
        for c, k in zip(tab.a[i - 1][1:], ks[1:]):
            if c != 0.0:
                acc = acc + c * k
        yi = y + dt * acc
        ti = t + tab.c[i] * dt
        pre1 = jnp.dot(yi, w1x, preferred_element_type=jnp.float32,
                precision=_DOT_PRECISION) + ti * w1t + b1
        h = _tanh(pre1)
        pre2 = jnp.dot(h, w2h, preferred_element_type=jnp.float32,
                precision=_DOT_PRECISION) + ti * w2t + b2
        ks.append(_tanh(pre2))
        yis.append(yi)
        hs.append(h)

    cerr = cerr_ref[:]
    # ---- seed cotangents ----
    # err = dt * sum_j btilde_j (k_j - k1) == dt * sum_j btilde_j k_j
    ct_ks = [tab.btilde[j] * (dt * cerr) for j in range(7)]
    ct_ks[6] = ct_ks[6] + ck7_ref[:]
    ct_ks[5] = ct_ks[5] + ck6_ref[:]
    ct_yi_seed = {6: cyn_ref[:], 5: cg6_ref[:]}

    # d err / d dt = sum(cerr * S), S = err/dt recomputed from the k's
    s_comb = tab.btilde[1] * (ks[1] - ks[0])
    for c, k in zip(tab.btilde[2:], ks[2:]):
        s_comb = s_comb + c * (k - ks[0])
    ct_dt = jnp.sum(cerr * s_comb)
    ct_t = jnp.zeros((), jnp.float32)
    ct_y = jnp.zeros_like(y)
    cw1x = jnp.zeros_like(w1x)
    cw1t = jnp.zeros_like(w1t)
    cb1 = jnp.zeros_like(b1)
    cw2h = jnp.zeros_like(w2h)
    cw2t = jnp.zeros_like(w2t)
    cb2 = jnp.zeros_like(b2)

    contract_batch = (((0,), (0,)), ((), ()))
    for i in range(6, 0, -1):
        k_i = ks[i]
        h_i = hs[i - 1]
        yi = yis[i - 1]
        ti = t + tab.c[i] * dt

        ct_pre2 = ct_ks[i] * (1.0 - k_i * k_i)
        cw2h = cw2h + jax.lax.dot_general(
            h_i, ct_pre2, contract_batch, preferred_element_type=jnp.float32,
            precision=_DOT_PRECISION,
        )
        rows2 = jnp.sum(ct_pre2, axis=0, keepdims=True)
        cw2t = cw2t + ti * rows2
        cb2 = cb2 + rows2
        ct_ti = jnp.sum(ct_pre2 * w2t)

        ct_h = jax.lax.dot_general(
            ct_pre2, w2h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_DOT_PRECISION,
        )
        ct_pre1 = ct_h * (1.0 - h_i * h_i)
        cw1x = cw1x + jax.lax.dot_general(
            yi, ct_pre1, contract_batch, preferred_element_type=jnp.float32,
            precision=_DOT_PRECISION,
        )
        rows1 = jnp.sum(ct_pre1, axis=0, keepdims=True)
        cw1t = cw1t + ti * rows1
        cb1 = cb1 + rows1
        ct_ti = ct_ti + jnp.sum(ct_pre1 * w1t)

        ct_yi = ct_yi_seed.get(i, 0.0) + jax.lax.dot_general(
            ct_pre1, w1x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_DOT_PRECISION,
        )
        ct_y = ct_y + ct_yi
        acc = tab.a[i - 1][0] * ks[0]
        for c, k in zip(tab.a[i - 1][1:], ks[1:]):
            if c != 0.0:
                acc = acc + c * k
        ct_dt = ct_dt + jnp.sum(ct_yi * acc) + tab.c[i] * ct_ti
        ct_t = ct_t + ct_ti
        for j, c in enumerate(tab.a[i - 1]):
            if c != 0.0:
                ct_ks[j] = ct_ks[j] + (dt * c) * ct_yi

    cy_ref[:] = ct_y
    ck1_ref[:] = ct_ks[0]

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        cw1x_ref[:] = cw1x
        cw1t_ref[:] = cw1t
        cb1_ref[:] = cb1
        cw2h_ref[:] = cw2h
        cw2t_ref[:] = cw2t
        cb2_ref[:] = cb2
        ct_ref[0, 0] = ct_t
        cdt_ref[0, 0] = ct_dt

    @pl.when(jnp.logical_not(first))
    def _():
        cw1x_ref[:] = cw1x_ref[:] + cw1x
        cw1t_ref[:] = cw1t_ref[:] + cw1t
        cb1_ref[:] = cb1_ref[:] + cb1
        cw2h_ref[:] = cw2h_ref[:] + cw2h
        cw2t_ref[:] = cw2t_ref[:] + cw2t
        cb2_ref[:] = cb2_ref[:] + cb2
        ct_ref[0, 0] = ct_ref[0, 0] + ct_t
        cdt_ref[0, 0] = cdt_ref[0, 0] + ct_dt


def _pallas_bwd(t, dt, y, k1, parts, cotangents, block_batch: int = 64):
    if _interpret_under_shard_map(y):
        with jax.default_matmul_precision("highest"):
            _, vjp_fn = jax.vjp(_reference_sweep, t, dt, y, k1, parts)
            return vjp_fn(cotangents)
    # Smaller tiles than the forward: the backward keeps the stage stacks
    # (6 yi + 7 k) AND five cotangent blocks live in VMEM — 128-row tiles
    # exceed the 16MB scoped limit at dim=784.
    batch, dim = y.shape
    bt = _pick_block(batch, block_batch)
    grid = (pl.cdiv(batch, bt),)
    w1x, w1t, b1, w2h, w2t, b2 = parts
    hidden = w1x.shape[1]
    cyn, ck7, cerr, ck6, cg6 = cotangents

    t2 = jnp.reshape(t.astype(jnp.float32), (1, 1))
    dt2 = jnp.reshape(dt.astype(jnp.float32), (1, 1))
    (t2, dt2, w1x, w1t, b1, w2h, w2t, b2) = _pvary_like(
        y, t2, dt2, w1x, w1t, b1, w2h, w2t, b2)

    row_spec = pl.BlockSpec((bt, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    smem_scalar = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    f32 = jnp.float32
    out = pl.pallas_call(
        _fused_bwd_kernel,
        grid=grid,
        in_specs=[
            smem_scalar, smem_scalar,
            row_spec, row_spec,
            full((dim, hidden)), full((1, hidden)), full((1, hidden)),
            full((hidden, dim)), full((1, dim)), full((1, dim)),
            row_spec, row_spec, row_spec, row_spec, row_spec,
        ],
        out_specs=[
            row_spec, row_spec,
            full((dim, hidden)), full((1, hidden)), full((1, hidden)),
            full((hidden, dim)), full((1, dim)), full((1, dim)),
            smem_scalar, smem_scalar,
        ],
        out_shape=[
            _vma_struct((batch, dim), y.dtype, y),
            _vma_struct((batch, dim), y.dtype, y),
            _vma_struct((dim, hidden), f32, y),
            _vma_struct((1, hidden), f32, y),
            _vma_struct((1, hidden), f32, y),
            _vma_struct((hidden, dim), f32, y),
            _vma_struct((1, dim), f32, y),
            _vma_struct((1, dim), f32, y),
            _vma_struct((1, 1), f32, y),
            _vma_struct((1, 1), f32, y),
        ],
        interpret=jax.default_backend() == "cpu",
    )(t2, dt2, y, k1, w1x, w1t, b1, w2h, w2t, b2, cyn, ck7, cerr, ck6, cg6)

    cy, ck1, cw1x, cw1t, cb1, cw2h, cw2t, cb2, ct_t, ct_dt = out
    # Replicated primals (weights, t, dt) take the psum of the per-shard
    # cotangents — the adjoint of replication under shard_map.
    (cw1x, cw1t, cb1, cw2h, cw2t, cb2, ct_t, ct_dt) = _psum_cts(
        y, cw1x, cw1t, cb1, cw2h, cw2t, cb2, ct_t, ct_dt)
    ct_t = ct_t[0, 0].astype(jnp.result_type(t))
    ct_dt = ct_dt[0, 0].astype(jnp.result_type(dt))
    # Match the original params structure: biases were lifted to (1, X).
    cparts = (cw1x, cw1t, cb1, cw2h, cw2t, cb2)
    return ct_t, ct_dt, cy, ck1, cparts


# PRECISION IS LOAD-BEARING in the backward. A custom_vjp's bwd function
# is traced lazily during backward-pass construction — OUTSIDE any
# `jax.default_matmul_precision` context that wrapped the forward solve —
# so contractions traced there would silently run at the TPU's bf16
# default. That rounding noise, amplified by 1/tol (~7e7 at rtol=1.4e-8)
# through the controller's dt feedback, made end-to-end solve gradients
# diverge exponentially with step count (inf by ~40 steps). The plain-XLA
# path was immune because transposed dots inherit the forward op's baked
# precision attribute. Hence: every contraction in this module carries an
# explicit `precision=HIGHEST`, and the XLA-recompute backward is traced
# under the context as well.
USE_PALLAS_BWD = True


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused_step(t, dt, y, k1, parts):
    return _pallas_sweep(t, dt, y, k1, parts)


def _fused_step_fwd(t, dt, y, k1, parts):
    return _pallas_sweep(t, dt, y, k1, parts), (t, dt, y, k1, parts)


def _fused_step_bwd(residuals, cotangents):
    t, dt, y, k1, parts = residuals
    if USE_PALLAS_BWD:
        return _pallas_bwd(t, dt, y, k1, parts, cotangents)
    with jax.default_matmul_precision("highest"):
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


# ---------------------------------------------------------------------------
# Lane-wise fused trial step: per-lane (t, dt) columns.
#
# The per-sample batched engine (ops.per_sample_batched) advances every
# batch row under its OWN controller, so each trial step has a (batch,)
# vector of times and step sizes instead of one scalar pair. The stage
# algebra is identical — t and dt simply broadcast as (batch, 1) columns
# through the stage lincombs and the time-row rank-1 updates — so these
# kernels are the scalar kernels above with the SMEM scalars replaced by
# VMEM columns, and the scalar (t, dt) cotangent reductions replaced by
# per-lane row reductions. This is what lets the fastest per-sample
# engine ride the same fused stage sweep as the global engine (round 5;
# previously `per_sample` and `fused` were mutually exclusive).
# ---------------------------------------------------------------------------


def _reference_sweep_lanes(tc, dtc, y, k1, parts):
    """Plain-XLA lane-wise sweep (interpret-mode fallback + oracle).

    ``tc``/``dtc`` are (batch, 1) columns; everything else matches
    ``_reference_sweep``."""
    tab = TSIT5
    w1x, w1t, b1, w2h, w2t, b2 = parts
    ks = [k1]
    y_stage = y
    for i in range(1, 7):
        acc = sum(c * k for c, k in zip(tab.a[i - 1], ks) if c != 0.0)
        y_stage = y + dtc * acc
        ti = tc + tab.c[i] * dtc
        ks.append(_mlp_k(y_stage, ti, w1x, w1t, b1, w2h, w2t, b2))
        if i == 5:
            g6 = y_stage
    y_new = y_stage
    err = dtc * sum(
        c * (k - ks[0]) for c, k in zip(tab.btilde[1:], ks[1:])
    )
    return y_new, ks[-1], err, ks[-2], g6


def _fused_step_kernel_lanes(
    tc_ref, dtc_ref,  # (Bt, 1) VMEM columns
    y_ref, k1_ref,    # (Bt, D) VMEM
    w1x_ref, w1t_ref, b1_ref, w2h_ref, w2t_ref, b2_ref,
    ynew_ref, k7_ref, err_ref, k6_ref, g6_ref,
):
    tab = TSIT5
    tc = tc_ref[:]
    dtc = dtc_ref[:]
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
        y_stage = y + dtc * acc
        ti = tc + tab.c[i] * dtc
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
    err_ref[:] = dtc * err


# Lane-wise kernels run one launch per trial step inside the engine's
# while_loop, so sequential batch tiles inside a launch are pure added
# latency (the round-3 whole-solve lesson). Use ONE tile whenever the
# working set fits a raised scoped-VMEM limit (v5e: 128MB/core), falling
# back to standard tiling for larger batches.
_LANES_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def _lanes_block(batch: int, dim: int, arrays: int, target: int) -> int:
    """Largest tile whose ``arrays`` live (tile, dim) f32 blocks fit
    ~60MB of the raised limit (leaving ~40MB for weights, hidden-width
    blocks, and Mosaic's own copies), halving from whole-batch; the
    standard tiling is the floor."""
    row_bytes = (-(-dim // 128) * 128) * 4  # lane-padded f32 row
    bt = batch
    while bt > target and bt % 8 == 0 and batch % bt == 0:
        if arrays * bt * row_bytes <= 60 * 2**20:
            return bt
        bt //= 2
    return _pick_block(batch, target)


def _pallas_sweep_lanes(tc, dtc, y, k1, parts, block_batch: int = 128):
    if _interpret_under_shard_map(y):
        return _reference_sweep_lanes(tc, dtc, y, k1, parts)
    batch, dim = y.shape
    bt = _lanes_block(batch, dim, arrays=20, target=block_batch)
    grid = (pl.cdiv(batch, bt),)
    w1x, w1t, b1, w2h, w2t, b2 = parts
    hidden = w1x.shape[1]

    (w1x, w1t, b1, w2h, w2t, b2) = _pvary_like(
        y, w1x, w1t, b1, w2h, w2t, b2)

    row_spec = pl.BlockSpec((bt, dim), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((bt, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _fused_step_kernel_lanes,
        grid=grid,
        in_specs=[
            col_spec, col_spec,
            row_spec, row_spec,
            full((dim, hidden)),
            full((1, hidden)),
            full((1, hidden)),
            full((hidden, dim)),
            full((1, dim)),
            full((1, dim)),
        ],
        out_specs=[row_spec] * 5,
        out_shape=[_vma_struct((batch, dim), y.dtype, y)] * 5,
        compiler_params=_LANES_COMPILER_PARAMS,
        interpret=jax.default_backend() == "cpu",
    )(tc, dtc, y, k1, w1x, w1t, b1, w2h, w2t, b2)
    return tuple(out)


def _fused_bwd_kernel_lanes(
    tc_ref, dtc_ref,  # (Bt, 1) VMEM columns
    y_ref, k1_ref,
    w1x_ref, w1t_ref, b1_ref, w2h_ref, w2t_ref, b2_ref,
    cyn_ref, ck7_ref, cerr_ref, ck6_ref, cg6_ref,
    # outputs
    cy_ref, ck1_ref,
    cw1x_ref, cw1t_ref, cb1_ref, cw2h_ref, cw2t_ref, cb2_ref,
    ctc_ref, cdtc_ref,  # (Bt, 1) per-lane cotangent columns
):
    """Lane-wise fused backward: the scalar kernel's (t, dt) cotangent
    scalars become per-lane columns (each lane's time/step-size feeds
    only its own row), and the time-row weight cotangents contract the
    per-lane ti column against the pre-activation cotangents over the
    batch axis instead of scaling a row sum."""
    tab = TSIT5
    tc = tc_ref[:]
    dtc = dtc_ref[:]
    y = y_ref[:]
    w1x = w1x_ref[:]
    w1t = w1t_ref[:]
    b1 = b1_ref[:]
    w2h = w2h_ref[:]
    w2t = w2t_ref[:]
    b2 = b2_ref[:]

    # ---- forward recompute, keeping stage values live in VMEM ----
    ks = [k1_ref[:]]
    yis, hs = [], []
    for i in range(1, 7):
        acc = tab.a[i - 1][0] * ks[0]
        for c, k in zip(tab.a[i - 1][1:], ks[1:]):
            if c != 0.0:
                acc = acc + c * k
        yi = y + dtc * acc
        ti = tc + tab.c[i] * dtc
        pre1 = jnp.dot(yi, w1x, preferred_element_type=jnp.float32,
                       precision=_DOT_PRECISION) + ti * w1t + b1
        h = _tanh(pre1)
        pre2 = jnp.dot(h, w2h, preferred_element_type=jnp.float32,
                       precision=_DOT_PRECISION) + ti * w2t + b2
        ks.append(_tanh(pre2))
        yis.append(yi)
        hs.append(h)

    cerr = cerr_ref[:]
    # ---- seed cotangents ----
    ct_ks = [tab.btilde[j] * (dtc * cerr) for j in range(7)]
    ct_ks[6] = ct_ks[6] + ck7_ref[:]
    ct_ks[5] = ct_ks[5] + ck6_ref[:]
    ct_yi_seed = {6: cyn_ref[:], 5: cg6_ref[:]}

    s_comb = tab.btilde[1] * (ks[1] - ks[0])
    for c, k in zip(tab.btilde[2:], ks[2:]):
        s_comb = s_comb + c * (k - ks[0])
    ct_dt = jnp.sum(cerr * s_comb, axis=1, keepdims=True)   # (Bt, 1)
    ct_t = jnp.zeros_like(ct_dt)
    ct_y = jnp.zeros_like(y)
    cw1x = jnp.zeros_like(w1x)
    cw1t = jnp.zeros_like(w1t)
    cb1 = jnp.zeros_like(b1)
    cw2h = jnp.zeros_like(w2h)
    cw2t = jnp.zeros_like(w2t)
    cb2 = jnp.zeros_like(b2)

    contract_batch = (((0,), (0,)), ((), ()))
    for i in range(6, 0, -1):
        k_i = ks[i]
        h_i = hs[i - 1]
        yi = yis[i - 1]
        ti = tc + tab.c[i] * dtc                            # (Bt, 1)

        ct_pre2 = ct_ks[i] * (1.0 - k_i * k_i)
        cw2h = cw2h + jax.lax.dot_general(
            h_i, ct_pre2, contract_batch,
            preferred_element_type=jnp.float32,
            precision=_DOT_PRECISION,
        )
        # w2t row cotangent: sum_b ti_b * ct_pre2[b, :] — a (1, Bt) x
        # (Bt, D) contraction over the batch axis.
        cw2t = cw2t + jax.lax.dot_general(
            ti, ct_pre2, contract_batch,
            preferred_element_type=jnp.float32,
            precision=_DOT_PRECISION,
        )
        cb2 = cb2 + jnp.sum(ct_pre2, axis=0, keepdims=True)
        ct_ti = jnp.sum(ct_pre2 * w2t, axis=1, keepdims=True)

        ct_h = jax.lax.dot_general(
            ct_pre2, w2h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_DOT_PRECISION,
        )
        ct_pre1 = ct_h * (1.0 - h_i * h_i)
        cw1x = cw1x + jax.lax.dot_general(
            yi, ct_pre1, contract_batch,
            preferred_element_type=jnp.float32,
            precision=_DOT_PRECISION,
        )
        cw1t = cw1t + jax.lax.dot_general(
            ti, ct_pre1, contract_batch,
            preferred_element_type=jnp.float32,
            precision=_DOT_PRECISION,
        )
        cb1 = cb1 + jnp.sum(ct_pre1, axis=0, keepdims=True)
        ct_ti = ct_ti + jnp.sum(ct_pre1 * w1t, axis=1, keepdims=True)

        ct_yi = ct_yi_seed.get(i, 0.0) + jax.lax.dot_general(
            ct_pre1, w1x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_DOT_PRECISION,
        )
        ct_y = ct_y + ct_yi
        acc = tab.a[i - 1][0] * ks[0]
        for c, k in zip(tab.a[i - 1][1:], ks[1:]):
            if c != 0.0:
                acc = acc + c * k
        ct_dt = (ct_dt + jnp.sum(ct_yi * acc, axis=1, keepdims=True)
                 + tab.c[i] * ct_ti)
        ct_t = ct_t + ct_ti
        for j, c in enumerate(tab.a[i - 1]):
            if c != 0.0:
                ct_ks[j] = ct_ks[j] + (dtc * c) * ct_yi

    cy_ref[:] = ct_y
    ck1_ref[:] = ct_ks[0]
    ctc_ref[:] = ct_t
    cdtc_ref[:] = ct_dt

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        cw1x_ref[:] = cw1x
        cw1t_ref[:] = cw1t
        cb1_ref[:] = cb1
        cw2h_ref[:] = cw2h
        cw2t_ref[:] = cw2t
        cb2_ref[:] = cb2

    @pl.when(jnp.logical_not(first))
    def _():
        cw1x_ref[:] = cw1x_ref[:] + cw1x
        cw1t_ref[:] = cw1t_ref[:] + cw1t
        cb1_ref[:] = cb1_ref[:] + cb1
        cw2h_ref[:] = cw2h_ref[:] + cw2h
        cw2t_ref[:] = cw2t_ref[:] + cw2t
        cb2_ref[:] = cb2_ref[:] + cb2


def _pallas_bwd_lanes(tc, dtc, y, k1, parts, cotangents,
                      block_batch: int = 64):
    if _interpret_under_shard_map(y):
        with jax.default_matmul_precision("highest"):
            _, vjp_fn = jax.vjp(_reference_sweep_lanes, tc, dtc, y, k1,
                                parts)
            return vjp_fn(cotangents)
    batch, dim = y.shape
    bt = _lanes_block(batch, dim, arrays=34, target=block_batch)
    grid = (pl.cdiv(batch, bt),)
    w1x, w1t, b1, w2h, w2t, b2 = parts
    hidden = w1x.shape[1]
    cyn, ck7, cerr, ck6, cg6 = cotangents

    (w1x, w1t, b1, w2h, w2t, b2) = _pvary_like(
        y, w1x, w1t, b1, w2h, w2t, b2)

    row_spec = pl.BlockSpec((bt, dim), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((bt, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)

    f32 = jnp.float32
    out = pl.pallas_call(
        _fused_bwd_kernel_lanes,
        grid=grid,
        in_specs=[
            col_spec, col_spec,
            row_spec, row_spec,
            full((dim, hidden)), full((1, hidden)), full((1, hidden)),
            full((hidden, dim)), full((1, dim)), full((1, dim)),
            row_spec, row_spec, row_spec, row_spec, row_spec,
        ],
        out_specs=[
            row_spec, row_spec,
            full((dim, hidden)), full((1, hidden)), full((1, hidden)),
            full((hidden, dim)), full((1, dim)), full((1, dim)),
            col_spec, col_spec,
        ],
        out_shape=[
            _vma_struct((batch, dim), y.dtype, y),
            _vma_struct((batch, dim), y.dtype, y),
            _vma_struct((dim, hidden), f32, y),
            _vma_struct((1, hidden), f32, y),
            _vma_struct((1, hidden), f32, y),
            _vma_struct((hidden, dim), f32, y),
            _vma_struct((1, dim), f32, y),
            _vma_struct((1, dim), f32, y),
            _vma_struct((batch, 1), f32, y),
            _vma_struct((batch, 1), f32, y),
        ],
        compiler_params=_LANES_COMPILER_PARAMS,
        interpret=jax.default_backend() == "cpu",
    )(tc, dtc, y, k1, w1x, w1t, b1, w2h, w2t, b2, cyn, ck7, cerr, ck6, cg6)

    cy, ck1, cw1x, cw1t, cb1, cw2h, cw2t, cb2, ctc, cdtc = out
    (cw1x, cw1t, cb1, cw2h, cw2t, cb2) = _psum_cts(
        y, cw1x, cw1t, cb1, cw2h, cw2t, cb2)
    cparts = (cw1x, cw1t, cb1, cw2h, cw2t, cb2)
    return ctc.astype(tc.dtype), cdtc.astype(dtc.dtype), cy, ck1, cparts


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused_step_lanes(tc, dtc, y, k1, parts):
    return _pallas_sweep_lanes(tc, dtc, y, k1, parts)


def _fused_step_lanes_fwd(tc, dtc, y, k1, parts):
    return _pallas_sweep_lanes(tc, dtc, y, k1, parts), (tc, dtc, y, k1,
                                                        parts)


def _fused_step_lanes_bwd(residuals, cotangents):
    tc, dtc, y, k1, parts = residuals
    if USE_PALLAS_BWD:
        return _pallas_bwd_lanes(tc, dtc, y, k1, parts, cotangents)
    with jax.default_matmul_precision("highest"):
        _, vjp_fn = jax.vjp(_reference_sweep_lanes, tc, dtc, y, k1, parts)
        return vjp_fn(cotangents)


_fused_step_lanes.defvjp(_fused_step_lanes_fwd, _fused_step_lanes_bwd)


def mlp_dynamics_sweep_lanes(t, dt, y, k1, params):
    """Lane-wise ``stage_sweep`` for the per-sample batched engine
    (``ops.per_sample_batched``): the fused Tsit5 trial step over
    ``models.basic.MLPDynamics`` params with per-lane times and step
    sizes. ``t``/``dt`` are ``(batch,)`` vectors; returns
    ``(y_new, k7, err, k6, g6)`` with every row advanced at its own
    ``(t_i, dt_i)``."""
    tc = t.astype(jnp.float32)[:, None]
    dtc = dt.astype(jnp.float32)[:, None]
    y_new, k7, err, k6, g6 = _fused_step_lanes(
        tc, dtc, y, k1, _split_params(params))
    return y_new, k7, err, k6, g6


# ---------------------------------------------------------------------------
# Normed trial step: error/stiffness norms reduced in-kernel.
#
# The plain fused step still writes three full-size arrays (err, k6, g6) to
# HBM only for the solver to immediately reduce them to three scalars (the
# tolerance-normalized error norm and the two stiffness-estimate norms).
# This variant folds those reductions into the same VMEM pass: outputs are
# (y_new, k7) plus three accumulated sums-of-squares — 60% less output
# traffic per trial step, and (because only scalars need the cross-shard
# reduction) the fused path composes with shard_map data parallelism: the
# solver psums the scalars, the kernel never communicates.
# ---------------------------------------------------------------------------


def _normed_bwd_math(t, dt, y, k1, parts, cts, rtol, atol, res=None):
    """Hand-derived backward of the NORMED Tsit5 stage algebra over
    MLPDynamics, as a pure function of loaded values.

    Maps the cotangents ``cts = (ct_y_new, ct_k7, ct_err_ssq, ct_num_ssq,
    ct_den_ssq)`` to ``(ct_t, ct_dt, ct_y, ct_k1, ct_parts)``. Recomputes
    the six stages (keeping only the k's and hidden activations live —
    stage states are cheap lincombs, rebuilt in the reverse loop), then
    runs the transposed chain: tanh derivatives, transposed contractions,
    stage-lincomb transposes, and the norm seeds. Used by BOTH the
    step-level normed backward kernel below and the whole-solve backward
    kernel (ops.pallas_solve), replacing the traced ``jax.vjp`` of the
    algebra whose ~20 live batch-size residuals are VMEM-scheduling-bound
    (measured round 4: 152 us/step traced vs the step-level hand chain's
    ~50 us/step at the flagship shape).

    ``res``, when given, is ``(ks, hs)`` saved from the matching forward
    (``normed_algebra_fwd_res``) and skips the stage recompute entirely —
    the whole-solve backward kernel traces the trial-step forward for its
    primal outputs anyway, so recomputing here would run the 12
    contractions + 12 accurate-tanh evaluations a THIRD time per step."""
    tab = TSIT5
    w1x, w1t, b1, w2h, w2t, b2 = parts
    cyn, ck7, ct_errssq, ct_numssq, ct_denssq = cts

    def stage_acc(i, ks):
        acc = tab.a[i - 1][0] * ks[0]
        for c, k in zip(tab.a[i - 1][1:], ks[1:]):
            if c != 0.0:
                acc = acc + c * k
        return acc

    if res is None:
        # ---- forward recompute, stage values live in VMEM ----
        ks = [k1]
        hs = []
        for i in range(1, 7):
            yi = y + dt * stage_acc(i, ks)
            ti = t + tab.c[i] * dt
            pre1 = jnp.dot(yi, w1x, preferred_element_type=jnp.float32,
                           precision=_DOT_PRECISION) + ti * w1t + b1
            h = _tanh(pre1)
            pre2 = jnp.dot(h, w2h, preferred_element_type=jnp.float32,
                           precision=_DOT_PRECISION) + ti * w2t + b2
            ks.append(_tanh(pre2))
            hs.append(h)
    else:
        ks, hs = (list(res[0]), list(res[1]))
    y_new = y + dt * stage_acc(6, ks)

    # ---- seed cotangents from the scalar norm cotangents ----
    # err_ssq = sum((err/denom)^2), err = dt * S, S = sum btilde_j k_j
    s_comb = tab.btilde[1] * (ks[1] - ks[0])
    for c, k in zip(tab.btilde[2:], ks[2:]):
        s_comb = s_comb + c * (k - ks[0])
    err = dt * s_comb
    denom = atol + jnp.maximum(jnp.abs(y), jnp.abs(y_new)) * rtol
    scaled = err / denom
    cerr = ct_errssq * 2.0 * scaled / denom
    # denom path: d err_ssq / d denom = -2 scaled^2 / denom, routed to
    # whichever of |y|, |y_new| is the max (jnp.maximum subgradient).
    cdenom = ct_errssq * (-2.0) * scaled * scaled / denom
    y_is_max = jnp.abs(y) >= jnp.abs(y_new)
    to_y = jnp.where(y_is_max, cdenom * rtol * jnp.sign(y), 0.0)
    to_ynew = jnp.where(y_is_max, 0.0, cdenom * rtol * jnp.sign(y_new))

    # num_ssq = sum((k7-k6)^2); den_ssq = sum((y_new-g6)^2), g6 = yis[4]
    dk = ks[6] - ks[5]
    d_k7 = ct_numssq * 2.0 * dk
    dg = y_new - (y + dt * stage_acc(5, ks))
    d_ynew = ct_denssq * 2.0 * dg

    ct_ks = [tab.btilde[j] * (dt * cerr) for j in range(7)]
    ct_ks[6] = ct_ks[6] + ck7 + d_k7
    ct_ks[5] = ct_ks[5] - d_k7
    ct_yi_seed = {6: cyn + d_ynew + to_ynew, 5: -d_ynew}

    ct_dt = jnp.sum(cerr * s_comb)
    ct_t = jnp.zeros((), jnp.float32)
    ct_y = to_y
    # Layout discipline (the backward's actual bottleneck — measured
    # round 4: the whole-solve backward is precision-INSENSITIVE, i.e.
    # not MXU-pass-bound, and the traced transpose costs the same as this
    # chain did before this restructuring): every dot below is arranged
    # so the MXU contracts over each operand's MINOR-friendly axis and
    # the only relayouts are (a) the two weight transposes, hoisted out
    # of the stage loop (1 per call instead of 6), and (b) transposes of
    # the SMALL (batch, hidden) cotangent tiles. In particular the
    # (batch, dim) stage state `yi` is never transposed: dW1 accumulates
    # in TRANSPOSED (hidden, dim) layout and flips once at the end.
    w1xT = jnp.transpose(w1x)  # (hidden, dim) — once per call
    w2hT = jnp.transpose(w2h)  # (dim, hidden) — once per call
    cw1xT = jnp.zeros((w1x.shape[1], w1x.shape[0]), jnp.float32)
    cw1t = jnp.zeros_like(w1t)
    cb1 = jnp.zeros_like(b1)
    cw2h = jnp.zeros_like(w2h)
    cw2t = jnp.zeros_like(w2t)
    cb2 = jnp.zeros_like(b2)

    contract_batch = (((0,), (0,)), ((), ()))
    for i in range(6, 0, -1):
        k_i = ks[i]
        h_i = hs[i - 1]
        acc = stage_acc(i, ks)
        yi = y + dt * acc
        ti = t + tab.c[i] * dt

        ct_pre2 = ct_ks[i] * (1.0 - k_i * k_i)
        # dW2 = h^T @ ct_pre2: relayouts h (batch, hidden) — the small
        # tile, 8x less data than transposing ct_pre2 would move.
        cw2h = cw2h + jax.lax.dot_general(
            h_i, ct_pre2, contract_batch,
            preferred_element_type=jnp.float32,
            precision=_DOT_PRECISION,
        )
        rows2 = jnp.sum(ct_pre2, axis=0, keepdims=True)
        cw2t = cw2t + ti * rows2
        cb2 = cb2 + rows2
        ct_ti = jnp.sum(ct_pre2 * w2t)

        # ct_h = ct_pre2 @ W2^T as a STRAIGHT matmul against the hoisted
        # transpose (the ((1,),(1,)) form re-transposed w2h every stage).
        ct_h = jnp.dot(ct_pre2, w2hT,
                       preferred_element_type=jnp.float32,
                       precision=_DOT_PRECISION)
        ct_pre1 = ct_h * (1.0 - h_i * h_i)
        # dW1 accumulated TRANSPOSED: ct_pre1^T @ yi relayouts ct_pre1
        # (batch, hidden) instead of yi (batch, dim).
        cw1xT = cw1xT + jax.lax.dot_general(
            ct_pre1, yi, contract_batch,
            preferred_element_type=jnp.float32,
            precision=_DOT_PRECISION,
        )
        rows1 = jnp.sum(ct_pre1, axis=0, keepdims=True)
        cw1t = cw1t + ti * rows1
        cb1 = cb1 + rows1
        ct_ti = ct_ti + jnp.sum(ct_pre1 * w1t)

        ct_yi = ct_yi_seed.get(i, 0.0) + jnp.dot(
            ct_pre1, w1xT,
            preferred_element_type=jnp.float32,
            precision=_DOT_PRECISION,
        )
        ct_y = ct_y + ct_yi
        ct_dt = ct_dt + jnp.sum(ct_yi * acc) + tab.c[i] * ct_ti
        ct_t = ct_t + ct_ti
        for j, c in enumerate(tab.a[i - 1]):
            if c != 0.0:
                ct_ks[j] = ct_ks[j] + (dt * c) * ct_yi

    return (ct_t, ct_dt, ct_y, ct_ks[0],
            (jnp.transpose(cw1xT), cw1t, cb1, cw2h, cw2t, cb2))


def make_normed_algebra_bwd(rtol: float, atol: float):
    """The whole-solve kernels' ``algebra_bwd`` hook for MLPDynamics:
    ``(t, dt, y, k1, leaves, cts[, res]) -> (ct_t, ct_dt, ct_y, ct_k1,
    ct_leaves)`` with ``leaves`` in ``_split_params`` order, ``cts``
    the NORMED quintuple cotangent, and ``res`` the optional ``(ks, hs)``
    stage residuals saved by ``make_normed_algebra_fwd_res`` (skips the
    in-pullback stage recompute)."""

    def algebra_bwd(t, dt, y, k1, leaves, cts, res=None):
        ct_t, ct_dt, ct_y, ct_k1, ct_parts = _normed_bwd_math(
            t, dt, y, k1, tuple(leaves), tuple(cts), rtol, atol, res=res)
        return ct_t, ct_dt, ct_y, ct_k1, list(ct_parts)

    return algebra_bwd


def make_normed_algebra_fwd_res(rtol: float, atol: float):
    """Residual-capturing forward of the normed stage algebra for
    MLPDynamics: ``(t, dt, y, k1, leaves) -> (outs, (ks, hs))`` with
    ``outs`` the same quintuple as ``pallas_generic._stage_algebra`` —
    op-for-op identical math (``_mlp_k`` inlined so the hidden
    activations ``hs`` can be captured), so the primal values the
    whole-solve BACKWARD kernel replays (accept flags, controller
    scalars, Hermite inputs) stay bitwise-equal to the forward kernel's
    history. The captured ``(ks, hs)`` feed ``make_normed_algebra_bwd``'s
    ``res`` hook, removing one full stage-sweep recompute per reverse
    step (measured round 4: the whole-solve backward otherwise runs the
    forward algebra twice per step — once in the traced trial-step vjp,
    once inside the hand pullback)."""
    tab = TSIT5

    def algebra_fwd_res(t, dt, y, k1, leaves):
        w1x, w1t, b1, w2h, w2t, b2 = leaves
        ks = [k1]
        hs = []
        y_stage = y
        g6 = y
        for i in range(1, 7):
            acc = tab.a[i - 1][0] * ks[0]
            for c, k in zip(tab.a[i - 1][1:], ks[1:]):
                if c != 0.0:
                    acc = acc + c * k
            y_stage = y + dt * acc
            ti = t + tab.c[i] * dt
            pre1 = jnp.dot(y_stage, w1x, preferred_element_type=jnp.float32,
                           precision=_DOT_PRECISION) + ti * w1t + b1
            h = _tanh(pre1)
            pre2 = jnp.dot(h, w2h, preferred_element_type=jnp.float32,
                           precision=_DOT_PRECISION) + ti * w2t + b2
            ks.append(_tanh(pre2))
            hs.append(h)
            if i == 5:
                g6 = y_stage
        y_new = y_stage  # FSAL: b row == last a row
        err = tab.btilde[1] * (ks[1] - ks[0])
        for c, k in zip(tab.btilde[2:], ks[2:]):
            err = err + c * (k - ks[0])
        err = dt * err
        denom = atol + jnp.maximum(jnp.abs(y), jnp.abs(y_new)) * rtol
        scaled = err / denom
        dk = ks[-1] - ks[-2]
        dg = y_new - g6
        outs = (y_new, ks[-1], jnp.sum(scaled * scaled),
                jnp.sum(dk * dk), jnp.sum(dg * dg))
        return outs, (tuple(ks), tuple(hs))

    return algebra_fwd_res


def _make_normed_kernels(rtol: float, atol: float):
    """Kernel pair with the tolerance scale baked in as compile-time
    constants (rtol/atol are Python floats at trace time)."""

    def fwd_kernel(
        t_ref, dt_ref,  # SMEM scalars (1, 1)
        y_ref, k1_ref,  # (Bt, D) VMEM
        w1x_ref, w1t_ref, b1_ref, w2h_ref, w2t_ref, b2_ref,
        ynew_ref, k7_ref, errssq_ref, numssq_ref, denssq_ref,
    ):
        tab = TSIT5
        t = t_ref[0, 0]
        dt = dt_ref[0, 0]
        y = y_ref[:]
        parts = (w1x_ref[:], w1t_ref[:], b1_ref[:],
                 w2h_ref[:], w2t_ref[:], b2_ref[:])

        ks = [k1_ref[:]]
        y_stage = y
        g6 = y
        for i in range(1, 7):
            acc = tab.a[i - 1][0] * ks[0]
            for c, k in zip(tab.a[i - 1][1:], ks[1:]):
                if c != 0.0:
                    acc = acc + c * k
            y_stage = y + dt * acc
            ti = t + tab.c[i] * dt
            ks.append(_mlp_k(y_stage, ti, *parts))
            if i == 5:
                g6 = y_stage

        y_new = y_stage  # b row == last a row (FSAL)
        ynew_ref[:] = y_new
        k7_ref[:] = ks[-1]

        err = tab.btilde[1] * (ks[1] - ks[0])
        for c, k in zip(tab.btilde[2:], ks[2:]):
            err = err + c * (k - ks[0])
        err = dt * err
        denom = atol + jnp.maximum(jnp.abs(y), jnp.abs(y_new)) * rtol
        scaled = err / denom
        err_ssq = jnp.sum(scaled * scaled)
        dk = ks[-1] - ks[-2]
        num_ssq = jnp.sum(dk * dk)
        dg = y_new - g6
        den_ssq = jnp.sum(dg * dg)

        first = pl.program_id(0) == 0

        @pl.when(first)
        def _():
            errssq_ref[0, 0] = err_ssq
            numssq_ref[0, 0] = num_ssq
            denssq_ref[0, 0] = den_ssq

        @pl.when(jnp.logical_not(first))
        def _():
            errssq_ref[0, 0] = errssq_ref[0, 0] + err_ssq
            numssq_ref[0, 0] = numssq_ref[0, 0] + num_ssq
            denssq_ref[0, 0] = denssq_ref[0, 0] + den_ssq

    def bwd_kernel(
        t_ref, dt_ref,  # SMEM scalars (1, 1)
        y_ref, k1_ref,
        w1x_ref, w1t_ref, b1_ref, w2h_ref, w2t_ref, b2_ref,
        cyn_ref, ck7_ref,
        cerrssq_ref, cnumssq_ref, cdenssq_ref,  # SMEM scalar cotangents
        # outputs
        cy_ref, ck1_ref,
        cw1x_ref, cw1t_ref, cb1_ref, cw2h_ref, cw2t_ref, cb2_ref,
        ct_ref, cdt_ref,
    ):
        """Recompute the six stages in VMEM, seed the reverse chain from
        the scalar norm cotangents (expanded to elementwise cotangents
        in-register), then run the same transposed chain as the plain
        backward kernel. The math lives in ``normed_algebra_bwd`` (shared
        with the whole-solve backward kernel)."""
        parts = (w1x_ref[:], w1t_ref[:], b1_ref[:],
                 w2h_ref[:], w2t_ref[:], b2_ref[:])
        cts = (cyn_ref[:], ck7_ref[:], cerrssq_ref[0, 0],
               cnumssq_ref[0, 0], cdenssq_ref[0, 0])
        (ct_t, ct_dt, ct_y, ct_k1,
         (cw1x, cw1t, cb1, cw2h, cw2t, cb2)) = _normed_bwd_math(
            t_ref[0, 0], dt_ref[0, 0], y_ref[:], k1_ref[:], parts, cts,
            rtol, atol)

        cy_ref[:] = ct_y
        ck1_ref[:] = ct_k1

        first = pl.program_id(0) == 0

        @pl.when(first)
        def _():
            cw1x_ref[:] = cw1x
            cw1t_ref[:] = cw1t
            cb1_ref[:] = cb1
            cw2h_ref[:] = cw2h
            cw2t_ref[:] = cw2t
            cb2_ref[:] = cb2
            ct_ref[0, 0] = ct_t
            cdt_ref[0, 0] = ct_dt

        @pl.when(jnp.logical_not(first))
        def _():
            cw1x_ref[:] = cw1x_ref[:] + cw1x
            cw1t_ref[:] = cw1t_ref[:] + cw1t
            cb1_ref[:] = cb1_ref[:] + cb1
            cw2h_ref[:] = cw2h_ref[:] + cw2h
            cw2t_ref[:] = cw2t_ref[:] + cw2t
            cb2_ref[:] = cb2_ref[:] + cb2
            ct_ref[0, 0] = ct_ref[0, 0] + ct_t
            cdt_ref[0, 0] = cdt_ref[0, 0] + ct_dt

    return fwd_kernel, bwd_kernel


def _reference_normed_sweep(t, dt, y, k1, parts, rtol, atol):
    """Plain-XLA oracle with the identical algebra (incl. the maximum
    subgradient routing), used for interpret-mode tests and the
    jax.vjp-derived backward check."""
    y_new, k7, err, k6, g6 = _reference_sweep(t, dt, y, k1, parts)
    denom = atol + jnp.maximum(jnp.abs(y), jnp.abs(y_new)) * rtol
    scaled = err / denom
    dk = k7 - k6
    dg = y_new - g6
    return (y_new, k7, jnp.sum(scaled * scaled), jnp.sum(dk * dk),
            jnp.sum(dg * dg))


def _normed_pallas_fwd(t, dt, y, k1, parts, rtol, atol,
                       block_batch: int = 128):
    if _interpret_under_shard_map(y):
        return _reference_normed_sweep(t, dt, y, k1, parts, rtol, atol)
    batch, dim = y.shape
    bt = _pick_block(batch, block_batch)
    grid = (pl.cdiv(batch, bt),)
    w1x, w1t, b1, w2h, w2t, b2 = parts
    hidden = w1x.shape[1]
    fwd_kernel, _ = _make_normed_kernels(rtol, atol)

    t2 = jnp.reshape(t.astype(jnp.float32), (1, 1))
    dt2 = jnp.reshape(dt.astype(jnp.float32), (1, 1))
    (t2, dt2, w1x, w1t, b1, w2h, w2t, b2) = _pvary_like(
        y, t2, dt2, w1x, w1t, b1, w2h, w2t, b2)

    row_spec = pl.BlockSpec((bt, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    smem_scalar = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    f32 = jnp.float32
    out = pl.pallas_call(
        fwd_kernel,
        grid=grid,
        in_specs=[
            smem_scalar, smem_scalar,
            row_spec, row_spec,
            full((dim, hidden)), full((1, hidden)), full((1, hidden)),
            full((hidden, dim)), full((1, dim)), full((1, dim)),
        ],
        out_specs=[row_spec, row_spec, smem_scalar, smem_scalar, smem_scalar],
        out_shape=[
            _vma_struct((batch, dim), y.dtype, y),
            _vma_struct((batch, dim), y.dtype, y),
            _vma_struct((1, 1), f32, y),
            _vma_struct((1, 1), f32, y),
            _vma_struct((1, 1), f32, y),
        ],
        interpret=jax.default_backend() == "cpu",
    )(t2, dt2, y, k1, w1x, w1t, b1, w2h, w2t, b2)
    y_new, k7, errssq, numssq, denssq = out
    return y_new, k7, errssq[0, 0], numssq[0, 0], denssq[0, 0]


def _normed_pallas_bwd(t, dt, y, k1, parts, cotangents, rtol, atol,
                       block_batch: int = 64):
    # 128-row tiles at dim=784 overflow the 16MB scoped-VMEM budget by
    # ~0.75MB (the 7-deep k-stack + ct_ks accumulators + double-buffered
    # I/O row blocks); 64 is the largest fitting power of two.
    if _interpret_under_shard_map(y):
        with jax.default_matmul_precision("highest"):
            _, vjp_fn = jax.vjp(
                lambda *a: _reference_normed_sweep(*a, rtol, atol),
                t, dt, y, k1, parts,
            )
            return vjp_fn(cotangents)
    batch, dim = y.shape
    bt = _pick_block(batch, block_batch)
    grid = (pl.cdiv(batch, bt),)
    w1x, w1t, b1, w2h, w2t, b2 = parts
    hidden = w1x.shape[1]
    _, bwd_kernel = _make_normed_kernels(rtol, atol)
    cyn, ck7, cerrssq, cnumssq, cdenssq = cotangents

    t2 = jnp.reshape(t.astype(jnp.float32), (1, 1))
    dt2 = jnp.reshape(dt.astype(jnp.float32), (1, 1))
    cerr2 = jnp.reshape(cerrssq.astype(jnp.float32), (1, 1))
    cnum2 = jnp.reshape(cnumssq.astype(jnp.float32), (1, 1))
    cden2 = jnp.reshape(cdenssq.astype(jnp.float32), (1, 1))
    (t2, dt2, w1x, w1t, b1, w2h, w2t, b2, cerr2, cnum2, cden2) = _pvary_like(
        y, t2, dt2, w1x, w1t, b1, w2h, w2t, b2, cerr2, cnum2, cden2)

    row_spec = pl.BlockSpec((bt, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    smem_scalar = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    f32 = jnp.float32
    out = pl.pallas_call(
        bwd_kernel,
        grid=grid,
        in_specs=[
            smem_scalar, smem_scalar,
            row_spec, row_spec,
            full((dim, hidden)), full((1, hidden)), full((1, hidden)),
            full((hidden, dim)), full((1, dim)), full((1, dim)),
            row_spec, row_spec,
            smem_scalar, smem_scalar, smem_scalar,
        ],
        out_specs=[
            row_spec, row_spec,
            full((dim, hidden)), full((1, hidden)), full((1, hidden)),
            full((hidden, dim)), full((1, dim)), full((1, dim)),
            smem_scalar, smem_scalar,
        ],
        out_shape=[
            _vma_struct((batch, dim), y.dtype, y),
            _vma_struct((batch, dim), y.dtype, y),
            _vma_struct((dim, hidden), f32, y),
            _vma_struct((1, hidden), f32, y),
            _vma_struct((1, hidden), f32, y),
            _vma_struct((hidden, dim), f32, y),
            _vma_struct((1, dim), f32, y),
            _vma_struct((1, dim), f32, y),
            _vma_struct((1, 1), f32, y),
            _vma_struct((1, 1), f32, y),
        ],
        interpret=jax.default_backend() == "cpu",
    )(t2, dt2, y, k1, w1x, w1t, b1, w2h, w2t, b2,
      cyn, ck7, cerr2, cnum2, cden2)

    cy, ck1, cw1x, cw1t, cb1, cw2h, cw2t, cb2, ct_t, ct_dt = out
    (cw1x, cw1t, cb1, cw2h, cw2t, cb2, ct_t, ct_dt) = _psum_cts(
        y, cw1x, cw1t, cb1, cw2h, cw2t, cb2, ct_t, ct_dt)
    ct_t = ct_t[0, 0].astype(jnp.result_type(t))
    ct_dt = ct_dt[0, 0].astype(jnp.result_type(dt))
    cparts = (cw1x, cw1t, cb1, cw2h, cw2t, cb2)
    return ct_t, ct_dt, cy, ck1, cparts


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_step_normed(t, dt, y, k1, parts, rtol, atol):
    return _normed_pallas_fwd(t, dt, y, k1, parts, rtol, atol)


def _fused_step_normed_fwd(t, dt, y, k1, parts, rtol, atol):
    return (_normed_pallas_fwd(t, dt, y, k1, parts, rtol, atol),
            (t, dt, y, k1, parts))


def _fused_step_normed_bwd(rtol, atol, residuals, cotangents):
    t, dt, y, k1, parts = residuals
    if USE_PALLAS_BWD:
        return _normed_pallas_bwd(t, dt, y, k1, parts, cotangents, rtol, atol)
    with jax.default_matmul_precision("highest"):
        _, vjp_fn = jax.vjp(
            lambda *a: _reference_normed_sweep(*a, rtol, atol),
            t, dt, y, k1, parts,
        )
        return vjp_fn(cotangents)


_fused_step_normed.defvjp(_fused_step_normed_fwd, _fused_step_normed_bwd)


def mlp_dynamics_normed_sweep(t, dt, y, k1, params, rtol, atol):
    """Normed ``stage_sweep`` for ``ops.ode.odeint``: the fused trial step
    whose error/stiffness reductions happen inside the kernel; returns an
    ``ops.ode.NormedSweep`` (composes with ``axis_name`` data parallelism)."""
    from regneuralde_tpu.ops.ode import NormedSweep

    y_new, k7, err_ssq, num_ssq, den_ssq = _fused_step_normed(
        t, dt, y, k1, _split_params(params), float(rtol), float(atol)
    )
    return NormedSweep(y_new, k7, err_ssq, num_ssq, den_ssq)


def mlp_dynamics_normed_sweep_bwd(t, dt, y, k1, params, cts, rtol, atol):
    """Direct backward of the normed trial step for the fast adjoint path
    (``ops.ode._make_fast_adjoint_solve``): one backward-kernel call, no
    forward replay. ``cts`` = (ct_y_new, ct_k7, ct_err_ssq, ct_num_ssq,
    ct_den_ssq). Returns (ct_t, ct_dt, ct_y, ct_k1, ct_params) with the
    weight cotangents merged back into the flax param structure."""
    parts = _split_params(params)
    cts = (cts[0], cts[1],
           jnp.asarray(cts[2], jnp.float32), jnp.asarray(cts[3], jnp.float32),
           jnp.asarray(cts[4], jnp.float32))
    if _interpret_under_shard_map(y):
        with jax.default_matmul_precision("highest"):
            _, vjp_fn = jax.vjp(
                lambda *a: _reference_normed_sweep(*a, float(rtol), float(atol)),
                t, dt, y, k1, parts,
            )
            ct_t, ct_dt, cy, ck1, cparts = vjp_fn(cts)
    else:
        ct_t, ct_dt, cy, ck1, cparts = _normed_pallas_bwd(
            t, dt, y, k1, parts, cts, float(rtol), float(atol)
        )
    cw1x, cw1t, cb1, cw2h, cw2t, cb2 = cparts
    p = params["params"]
    ct_params = {"params": {
        "dense_1": {
            "kernel": jnp.concatenate([cw1x, cw1t], axis=0).astype(
                p["dense_1"]["kernel"].dtype),
            "bias": cb1[0].astype(p["dense_1"]["bias"].dtype),
        },
        "dense_2": {
            "kernel": jnp.concatenate([cw2h, cw2t], axis=0).astype(
                p["dense_2"]["kernel"].dtype),
            "bias": cb2[0].astype(p["dense_2"]["bias"].dtype),
        },
    }}
    return ct_t, ct_dt, cy, ck1, ct_params
