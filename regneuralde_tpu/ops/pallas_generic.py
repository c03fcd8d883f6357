"""Generic fused Tsit5 trial step for arbitrary small dynamics (Pallas).

``pallas_mlp`` hand-fuses the flagship MNIST dynamics. This module
generalizes the same design to ANY dynamics whose algebra can be traced
from loaded VMEM values — the latent-ODE ``AlternatingMLP``
(reference: experiments/latent_ode.jl:113-126) and FFJORD's augmented CSL
dynamics with the analytic Hutchinson product
(reference: experiments/ffjord_tabular.jl:48-106, src/models/ffjord.jl:53-66)
are wired below. One kernel per trial step:

* all six stage linear-combinations and dynamics evaluations VMEM-resident,
* the regrouped embedded error, tolerance-scaled error norm, and both
  stiffness norms reduced to scalars in-kernel (``ops.ode.NormedSweep``),
* the backward pass is a second fused kernel whose reverse chain is
  obtained by tracing ``jax.vjp`` of the SAME stage algebra inside the
  kernel body — no hand-derived transpose per model, bitwise-consistent
  with the forward by construction.

The caller provides ``apply_fn(t, y_tile, leaves) -> dy_tile`` over a flat
list of 2-D leaves, plus a ``batched`` mask marking leaves that carry the
batch axis (e.g. FFJORD's Hutchinson probe) and are row-tiled with ``y``;
all other leaves are broadcast whole into VMEM (weights are tiny here).
Under shard_map the wrappers declare varying-mesh-axes on outputs, pvary
replicated inputs, and psum the replicated-leaf cotangents (the adjoint of
replication); on the CPU mesh they fall back to the identical plain-XLA
algebra (Pallas's interpreter cannot evaluate vma-carrying operands).
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from regneuralde_tpu.ops.pallas_mlp import (
    _interpret_under_shard_map,
    _pick_block,
    _psum_cts,
    _pvary_like,
    _vma_struct,
)
from regneuralde_tpu.ops.tableaus import TSIT5


def dotH(a, b):
    """MXU contraction at float32-accurate precision; the embedded error
    is a 5th-order cancellation and bf16 noise would floor it.
    ``REGNDE_DOT_PRECISION`` (probe-only; see ops.pallas_mlp) lowers it
    for matmul-pass-count timing ablations."""
    from regneuralde_tpu.ops.pallas_mlp import _DOT_PRECISION

    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_DOT_PRECISION)


# Timing-only ablations of the trial-step ALGEBRA, comma-separated in
# REGNDE_ALG_ABLATE (or monkey-patched by tools/ablate_interleaved.py;
# read at trace time). These produce WRONG solver math — their only use
# is attributing the forward kernel's per-step cost to named ops. Legs:
#   "nolincomb"  stage input = y + dt*a[i][0]*k_prev (one FMA, not the
#                full lower-triangular combination)
#   "stages:N"   run N dynamics evaluations instead of 6
#   "noerr"      skip the embedded-error combination + the three
#                (batch, dim)->scalar reductions; constants keep the
#                controller chain alive
#   "noapply"    replace the dynamics evaluation with 0.999*y_stage
#                (keeps the loop-carried dependency, drops matmuls+tanh)
# Pair every leg with the whole-solve "fori:N" knob — wrong math changes
# the while-loop trip count, which would confound the timing.
import os as _os

_ALG_ABLATE = frozenset(
    filter(None, _os.environ.get("REGNDE_ALG_ABLATE", "").split(",")))


def _alg_num_stages() -> int:
    for a in _ALG_ABLATE:
        if a.startswith("stages:"):
            return int(a.split(":")[1])
    return 6


def _stage_algebra(apply_fn, rtol, atol, n_real=None):
    """The full trial-step math as a plain function of loaded values:
    (t, dt, y, k1, leaves) -> (y_new, k7, err_ssq, num_ssq, den_ssq).
    Used verbatim inside both kernels, as the XLA fallback, and as the
    test oracle.

    ``n_real`` (static): when the batch was padded to Mosaic's 8-row
    sublane alignment, only the first ``n_real`` rows are real samples —
    the three norm sums mask out the pad rows so EEst / eigen_est (and
    hence every controller decision) match the unpadded solve. Pad rows
    still produce y_new/k7 (discarded by the caller's slice)."""
    tab = TSIT5
    ablate = _ALG_ABLATE
    n_stages = _alg_num_stages()

    def algebra(t, dt, y, k1, leaves):
        ks = [k1]
        y_stage = y
        g6 = y
        for i in range(1, n_stages + 1):
            if "nolincomb" in ablate:
                acc = tab.a[i - 1][0] * ks[-1]
            else:
                acc = tab.a[i - 1][0] * ks[0]
                for c, k in zip(tab.a[i - 1][1:], ks[1:]):
                    if c != 0.0:
                        acc = acc + c * k
            y_stage = y + dt * acc
            if "noapply" in ablate:
                ks.append(0.999 * y_stage)
            else:
                ks.append(apply_fn(t + tab.c[i] * dt, y_stage, leaves))
            if i == 5:
                g6 = y_stage
        y_new = y_stage  # FSAL: b row == last a row
        if "noerr" in ablate:
            half = jnp.asarray(0.25, y.dtype) * (dt / dt)
            return (y_new, ks[-1], half * float(y.shape[0] * y.shape[1]),
                    half, half * 2.0)
        err = tab.btilde[1] * (ks[1] - ks[0])
        for c, k in zip(tab.btilde[2:], ks[2:]):
            err = err + c * (k - ks[0])
        err = dt * err
        denom = atol + jnp.maximum(jnp.abs(y), jnp.abs(y_new)) * rtol
        scaled = err / denom
        dk = ks[-1] - ks[-2]
        dg = y_new - g6
        if n_real is not None and n_real < y.shape[0]:
            rmask = (jax.lax.broadcasted_iota(jnp.int32, scaled.shape, 0)
                     < n_real)
            scaled = jnp.where(rmask, scaled, 0.0)
            dk = jnp.where(rmask, dk, 0.0)
            dg = jnp.where(rmask, dg, 0.0)
        return (y_new, ks[-1], jnp.sum(scaled * scaled),
                jnp.sum(dk * dk), jnp.sum(dg * dg))

    return algebra


def _stage_algebra_from_ks(rtol, atol):
    """Recombine ``_stage_algebra``'s quintuple from STORED stage
    derivatives: ``(t, dt, y, k1, ks6) -> (y_new, k7, err_ssq, num_ssq,
    den_ssq)`` with ``ks6`` the six fresh stage k's the matching forward
    captured (``pallas_mlp.make_normed_algebra_fwd_res``; ``k1`` is the
    FSAL seed already in the solver history).

    Pure lincombs and elementwise ops — no dynamics evaluations — with
    the accumulation order copied from ``_stage_algebra`` so every output
    is BITWISE equal to the forward kernel's, given the same ks: the
    whole-solve backward kernel replays controller decisions from these
    values, and one flipped accept would corrupt the adjoint."""
    tab = TSIT5

    def acc_of(i, ks):
        acc = tab.a[i - 1][0] * ks[0]
        for c, k in zip(tab.a[i - 1][1:], ks[1:]):
            if c != 0.0:
                acc = acc + c * k
        return acc

    def recombine(t, dt, y, k1, ks6):
        ks = [k1, *ks6]
        y_new = y + dt * acc_of(6, ks)
        g6 = y + dt * acc_of(5, ks)
        err = tab.btilde[1] * (ks[1] - ks[0])
        for c, k in zip(tab.btilde[2:], ks[2:]):
            err = err + c * (k - ks[0])
        err = dt * err
        denom = atol + jnp.maximum(jnp.abs(y), jnp.abs(y_new)) * rtol
        scaled = err / denom
        dk = ks[-1] - ks[-2]
        dg = y_new - g6
        return (y_new, ks[-1], jnp.sum(scaled * scaled),
                jnp.sum(dk * dk), jnp.sum(dg * dg))

    return recombine


def make_normed_tsit5_sweep(
    apply_fn: Callable,
    batched: Sequence[bool],
    rtol: float,
    atol: float,
    block_batch: int = 128,
):
    """Build ``sweep(t, dt, y, k1, leaves) -> NormedSweep`` with a fused
    Pallas forward and a vjp-traced fused backward.

    Args:
      apply_fn: ``(t, y_tile, leaves) -> dy_tile`` traced inside the
        kernel; every leaf arrives as a loaded 2-D value.
      batched: per-leaf flag — True leaves share ``y``'s batch axis and
        are row-tiled (their cotangents stay per-row); False leaves are
        replicated whole (their cotangents accumulate across tiles).
      rtol, atol: baked into the in-kernel error scale.
    """
    from regneuralde_tpu.ops.ode import NormedSweep

    batched = tuple(bool(b) for b in batched)
    algebra = _stage_algebra(apply_fn, rtol, atol)
    f32 = jnp.float32

    def fwd_pallas(t, dt, y, k1, leaves):
        batch, dim = y.shape
        bt = _pick_block(batch, block_batch)
        grid = (pl.cdiv(batch, bt),)

        def kernel(*refs):
            t_ref, dt_ref, y_ref, k1_ref = refs[:4]
            leaf_refs = refs[4 : 4 + len(leaves)]
            ynew_ref, k7_ref, errssq_ref, numssq_ref, denssq_ref = refs[
                4 + len(leaves):]
            vals = [r[:] for r in leaf_refs]
            y_new, k7, err_ssq, num_ssq, den_ssq = algebra(
                t_ref[0, 0], dt_ref[0, 0], y_ref[:], k1_ref[:], vals)
            ynew_ref[:] = y_new
            k7_ref[:] = k7
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

        t2 = jnp.reshape(t.astype(f32), (1, 1))
        dt2 = jnp.reshape(dt.astype(f32), (1, 1))
        inv = [t2, dt2] + [lf for lf, b in zip(leaves, batched) if not b]
        inv = _pvary_like(y, *inv)
        t2, dt2 = inv[0], inv[1]
        inv_leaves = list(inv[2:])
        leaves = [
            (inv_leaves.pop(0) if not b else lf)
            for lf, b in zip(leaves, batched)
        ]

        smem_scalar = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)
        row = lambda shape: pl.BlockSpec(
            (bt, shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
        full = lambda shape: pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        leaf_specs = [
            row(lf.shape) if b else full(lf.shape)
            for lf, b in zip(leaves, batched)
        ]

        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[smem_scalar, smem_scalar, row(y.shape), row(y.shape)]
            + leaf_specs,
            out_specs=[row(y.shape), row(y.shape), smem_scalar, smem_scalar,
                       smem_scalar],
            out_shape=[
                _vma_struct((batch, dim), y.dtype, y),
                _vma_struct((batch, dim), y.dtype, y),
                _vma_struct((1, 1), f32, y),
                _vma_struct((1, 1), f32, y),
                _vma_struct((1, 1), f32, y),
            ],
            interpret=jax.default_backend() == "cpu",
        )(t2, dt2, y, k1, *leaves)
        y_new, k7, errssq, numssq, denssq = out
        return y_new, k7, errssq[0, 0], numssq[0, 0], denssq[0, 0]

    def bwd_pallas(t, dt, y, k1, leaves, cts):
        batch, dim = y.shape
        bt = _pick_block(batch, block_batch // 2 or 1)
        grid = (pl.cdiv(batch, bt),)
        cyn, ck7, cerrssq, cnumssq, cdenssq = cts
        n = len(leaves)

        def kernel(*refs):
            t_ref, dt_ref, y_ref, k1_ref = refs[:4]
            leaf_refs = refs[4 : 4 + n]
            cyn_ref, ck7_ref, cerr_ref, cnum_ref, cden_ref = refs[
                4 + n : 9 + n]
            outs = refs[9 + n:]
            cy_ref, ck1_ref = outs[:2]
            cleaf_refs = outs[2 : 2 + n]
            ct_ref, cdt_ref = outs[2 + n:]

            vals = [r[:] for r in leaf_refs]
            _, vjp_fn = jax.vjp(
                algebra, t_ref[0, 0], dt_ref[0, 0], y_ref[:], k1_ref[:], vals
            )
            d_t, d_dt, d_y, d_k1, d_leaves = vjp_fn(
                (cyn_ref[:], ck7_ref[:], cerr_ref[0, 0], cnum_ref[0, 0],
                 cden_ref[0, 0])
            )
            cy_ref[:] = d_y
            ck1_ref[:] = d_k1
            for ref, d, b in zip(cleaf_refs, d_leaves, batched):
                if b:
                    ref[:] = d
            first = pl.program_id(0) == 0

            @pl.when(first)
            def _():
                for ref, d, b in zip(cleaf_refs, d_leaves, batched):
                    if not b:
                        ref[:] = d
                ct_ref[0, 0] = d_t
                cdt_ref[0, 0] = d_dt

            @pl.when(jnp.logical_not(first))
            def _():
                for ref, d, b in zip(cleaf_refs, d_leaves, batched):
                    if not b:
                        ref[:] = ref[:] + d
                ct_ref[0, 0] = ct_ref[0, 0] + d_t
                cdt_ref[0, 0] = cdt_ref[0, 0] + d_dt

        t2 = jnp.reshape(t.astype(f32), (1, 1))
        dt2 = jnp.reshape(dt.astype(f32), (1, 1))
        cerr2 = jnp.reshape(cerrssq.astype(f32), (1, 1))
        cnum2 = jnp.reshape(cnumssq.astype(f32), (1, 1))
        cden2 = jnp.reshape(cdenssq.astype(f32), (1, 1))
        inv = [t2, dt2, cerr2, cnum2, cden2] + [
            lf for lf, b in zip(leaves, batched) if not b
        ]
        inv = _pvary_like(y, *inv)
        t2, dt2, cerr2, cnum2, cden2 = inv[:5]
        inv_leaves = list(inv[5:])
        leaves = [
            (inv_leaves.pop(0) if not b else lf)
            for lf, b in zip(leaves, batched)
        ]

        smem_scalar = pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)
        row = lambda shape: pl.BlockSpec(
            (bt, shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
        full = lambda shape: pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        leaf_spec = lambda lf, b: row(lf.shape) if b else full(lf.shape)

        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=(
                [smem_scalar, smem_scalar, row(y.shape), row(y.shape)]
                + [leaf_spec(lf, b) for lf, b in zip(leaves, batched)]
                + [row(y.shape), row(y.shape), smem_scalar, smem_scalar,
                   smem_scalar]
            ),
            out_specs=(
                [row(y.shape), row(y.shape)]
                + [leaf_spec(lf, b) for lf, b in zip(leaves, batched)]
                + [smem_scalar, smem_scalar]
            ),
            out_shape=(
                [_vma_struct((batch, dim), y.dtype, y)] * 2
                + [_vma_struct(lf.shape, f32, y) for lf in leaves]
                + [_vma_struct((1, 1), f32, y)] * 2
            ),
            interpret=jax.default_backend() == "cpu",
        )(t2, dt2, y, k1, *leaves, cyn, ck7, cerr2, cnum2, cden2)

        d_y, d_k1 = out[0], out[1]
        d_leaves = list(out[2 : 2 + n])
        ct_t, ct_dt = out[2 + n], out[3 + n]
        # Replicated leaves and the scalars take the psum of per-shard
        # cotangents (adjoint of replication under shard_map).
        repl = [d for d, b in zip(d_leaves, batched) if not b]
        repl = list(_psum_cts(y, *repl, ct_t, ct_dt))
        ct_t, ct_dt = repl[-2], repl[-1]
        repl = repl[:-2]
        d_leaves = [
            (repl.pop(0) if not b else d) for d, b in zip(d_leaves, batched)
        ]
        return (
            ct_t[0, 0].astype(jnp.result_type(t)),
            ct_dt[0, 0].astype(jnp.result_type(dt)),
            d_y,
            d_k1,
            [d.astype(lf.dtype) for d, lf in zip(d_leaves, leaves)],
        )

    @jax.custom_vjp
    def fused(t, dt, y, k1, leaves):
        if _interpret_under_shard_map(y):
            with jax.default_matmul_precision("highest"):
                return algebra(t, dt, y, k1, leaves)
        return fwd_pallas(t, dt, y, k1, leaves)

    def fused_fwd(t, dt, y, k1, leaves):
        return fused(t, dt, y, k1, leaves), (t, dt, y, k1, leaves)

    def fused_bwd(res, cts):
        t, dt, y, k1, leaves = res
        if _interpret_under_shard_map(y):
            with jax.default_matmul_precision("highest"):
                _, vjp_fn = jax.vjp(algebra, t, dt, y, k1, leaves)
                return vjp_fn(cts)
        return bwd_pallas(t, dt, y, k1, leaves, cts)

    fused.defvjp(fused_fwd, fused_bwd)

    def sweep(t, dt, y, k1, leaves):
        y_new, k7, err_ssq, num_ssq, den_ssq = fused(t, dt, y, k1, leaves)
        return NormedSweep(y_new, k7, err_ssq, num_ssq, den_ssq)

    def sweep_bwd(t, dt, y, k1, leaves, cts):
        """Direct backward for the fast adjoint (ops.ode
        ``_make_fast_adjoint_solve``): one backward-kernel call, no forward
        replay. ``cts`` = (ct_y_new, ct_k7, ct_err_ssq, ct_num_ssq,
        ct_den_ssq); returns (ct_t, ct_dt, ct_y, ct_k1, ct_leaves)."""
        cts = (cts[0], cts[1],
               jnp.asarray(cts[2], f32), jnp.asarray(cts[3], f32),
               jnp.asarray(cts[4], f32))
        if _interpret_under_shard_map(y):
            with jax.default_matmul_precision("highest"):
                _, vjp_fn = jax.vjp(algebra, t, dt, y, k1, list(leaves))
                return vjp_fn(cts)
        return bwd_pallas(t, dt, y, k1, leaves, cts)

    return sweep, sweep_bwd, algebra


# ---------------------------------------------------------------------------
# Dynamics adapters: flax params -> flat 2-D leaves + in-kernel algebra
# ---------------------------------------------------------------------------


def alternating_mlp_leaves(params, depth: int) -> List[jnp.ndarray]:
    """Flatten ``models.basic.AlternatingMLP`` params (the latent-ODE
    generative dynamics, reference: experiments/latent_ode.jl:113-126)."""
    p = params["params"]
    leaves = []
    for i in range(depth):
        for name in (f"up_{i}", f"down_{i}"):
            leaves.append(p[name]["kernel"])
            leaves.append(p[name]["bias"][None, :])
    return leaves


def alternating_mlp_apply(depth: int) -> Callable:
    """In-kernel algebra of AlternatingMLP: tanh -> (Dense tanh)x2*depth.
    Uses jnp.tanh to match the flax module bit-for-bit on each backend."""

    def apply_fn(t, y, leaves):
        h = jnp.tanh(y)
        idx = 0
        for _ in range(depth):
            for _ in range(2):
                w, b = leaves[idx], leaves[idx + 1]
                idx += 2
                h = jnp.tanh(dotH(h, w) + b)
        return h

    return apply_fn


def alternating_mlp_unflatten_cts(params, d_leaves, depth: int):
    """Inverse of ``alternating_mlp_leaves`` for cotangents: rebuild the
    flax param structure (biases were lifted to (1, X))."""
    p = params["params"]
    out = {}
    idx = 0
    for i in range(depth):
        for name in (f"up_{i}", f"down_{i}"):
            out[name] = {
                "kernel": d_leaves[idx].astype(p[name]["kernel"].dtype),
                "bias": d_leaves[idx + 1][0].astype(p[name]["bias"].dtype),
            }
            idx += 2
    return {"params": out}


def make_alternating_mlp_sweep(params, depth: int, rtol: float, atol: float):
    """Fused trial-step sweep pair ``(sweep, sweep_bwd)`` for
    ``NeuralODE(AlternatingMLP(...))`` — the backward feeds the fast
    adjoint (ops.ode ``_make_fast_adjoint_solve``)."""
    leaves = alternating_mlp_leaves(params, depth)
    sweep, sweep_bwd, _ = make_normed_tsit5_sweep(
        alternating_mlp_apply(depth), [False] * len(leaves), rtol, atol
    )

    def fwd(t, dt, y, k1, p):
        return sweep(t, dt, y, k1, alternating_mlp_leaves(p, depth))

    def bwd(t, dt, y, k1, p, cts):
        ct_t, ct_dt, d_y, d_k1, d_leaves = sweep_bwd(
            t, dt, y, k1, alternating_mlp_leaves(p, depth), cts
        )
        return (ct_t, ct_dt, d_y, d_k1,
                alternating_mlp_unflatten_cts(p, d_leaves, depth))

    return fwd, bwd


def csl_aug_leaves(params, e: jnp.ndarray) -> List[jnp.ndarray]:
    """Flatten ``models.basic.CSLDynamics`` params + the per-solve
    Hutchinson probe (batched leaf)."""
    p = params["params"]
    leaves = []
    for name in ("csl1", "csl2", "csl3"):
        layer = p[name]
        leaves.append(layer["layer"]["kernel"])
        leaves.append(layer["layer"]["bias"][None, :])
        leaves.append(layer["gate"]["kernel"])  # (1, out)
        leaves.append(layer["bias"]["kernel"])  # (1, out)
        leaves.append(layer["bias"]["bias"][None, :])
    leaves.append(e)
    return leaves


def csl_aug_apply(dim: int, kinetic: bool) -> Callable:
    """In-kernel algebra of FFJORD's augmented CSL dynamics with the
    analytic Hutchinson product (reference: src/models/ffjord.jl:53-66,
    experiments/ffjord_tabular.jl:48-106 — mirrors
    ``models.basic.CSLDynamics.forw_n_back``). The augmented state is
    ``[z; logp(; kinetic; jacobian)]``; only ``z`` feeds the network."""

    def apply_fn(t, u, leaves):
        e = leaves[-1]
        z = u[:, :dim]

        def layer(h, off):
            W, b, Wg, Wb, bb = leaves[off : off + 5]
            gate = jax.nn.sigmoid(t * Wg)
            o = dotH(h, W) + b
            out = o * gate + (t * Wb + bb)
            back = lambda v: dotH(v, (W * gate).T)
            return out, back

        o1, back1 = layer(z, 0)
        h1 = jax.nn.softplus(o1)
        o2, back2 = layer(h1, 5)
        h2 = jax.nn.softplus(o2)
        mz, back3 = layer(h2, 10)

        v = back3(e)
        v = back2(v * jax.nn.sigmoid(o2))
        eJ = back1(v * jax.nn.sigmoid(o1))

        trace = jnp.sum(eJ * e, axis=-1, keepdims=True)
        if kinetic:
            k1 = jnp.sum(jnp.square(mz), axis=-1, keepdims=True)
            k2 = jnp.sum(jnp.square(eJ), axis=-1, keepdims=True)
            return jnp.concatenate([mz, -trace, k1, k2], axis=-1)
        return jnp.concatenate([mz, -trace], axis=-1)

    return apply_fn


def csl_unflatten_cts(params, d_leaves):
    """Inverse of ``csl_aug_leaves`` for cotangents, dropping the probe's
    cotangent (``e`` is an RNG draw — nothing differentiates w.r.t. it)."""
    p = params["params"]
    out = {}
    idx = 0
    for name in ("csl1", "csl2", "csl3"):
        layer = p[name]
        out[name] = {
            "layer": {
                "kernel": d_leaves[idx].astype(
                    layer["layer"]["kernel"].dtype),
                "bias": d_leaves[idx + 1][0].astype(
                    layer["layer"]["bias"].dtype),
            },
            "gate": {
                "kernel": d_leaves[idx + 2].astype(
                    layer["gate"]["kernel"].dtype),
            },
            "bias": {
                "kernel": d_leaves[idx + 3].astype(
                    layer["bias"]["kernel"].dtype),
                "bias": d_leaves[idx + 4][0].astype(
                    layer["bias"]["bias"].dtype),
            },
        }
        idx += 5
    return {"params": out}


def make_csl_ffjord_sweep(params, e: jnp.ndarray, dim: int, kinetic: bool,
                          rtol: float, atol: float):
    """Fused trial-step sweep pair ``(sweep, sweep_bwd)`` for
    ``FFJORD(CSLDynamics(...))`` with the analytic-VJP augmented
    dynamics. The probe ``e`` is baked into both directions; its cotangent
    is discarded (it is a per-solve RNG draw)."""
    n_leaves = len(csl_aug_leaves(params, e))
    sweep, sweep_bwd, _ = make_normed_tsit5_sweep(
        csl_aug_apply(dim, kinetic),
        [False] * (n_leaves - 1) + [True],  # the probe is batch-aligned
        rtol, atol,
    )

    def fwd(t, dt, u, k1, p):
        return sweep(t, dt, u, k1, csl_aug_leaves(p, e))

    def bwd(t, dt, u, k1, p, cts):
        ct_t, ct_dt, d_u, d_k1, d_leaves = sweep_bwd(
            t, dt, u, k1, csl_aug_leaves(p, e), cts
        )
        return ct_t, ct_dt, d_u, d_k1, csl_unflatten_cts(p, d_leaves)

    return fwd, bwd
