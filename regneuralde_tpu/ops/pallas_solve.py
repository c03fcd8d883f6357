"""Whole-solve fused Tsit5 kernels: ONE Pallas launch per direction.

The step-level fused kernels (ops.pallas_mlp / ops.pallas_generic) remove
HBM round-trips *within* a trial step, but the solve still executes one
XLA while-loop iteration per trial step — kernel launch, controller glue,
history-buffer updates — which dominates wall clock for small dynamics
(measured round 3: the latent-ODE forward costs ~76 us per trial step on
one v5e against a ~1 us compute floor). This module moves the ENTIRE
adaptive loop inside a single Pallas kernel:

* forward: an in-kernel ``lax.while_loop`` runs trial steps with the
  carry (t, dt, qold, y, f0) VMEM/register-resident; per-step history
  (the step-start state and FSAL derivative) is DMA'd to lane-padded
  HBM buffers; controller scalars and telemetry go to SMEM streams;
  ``saveat`` rows are Hermite-interpolated into an input/output-aliased
  VMEM buffer driven by a monotone CURSOR over the sorted grid: each step
  pays one scalar compare, and the row interpolation fires exactly
  ``n_save`` times per solve.
* backward: a second kernel walks the history in reverse, DMA-ing rows
  back in and seeding ``jax.vjp`` of the SAME in-kernel ``trial_step``
  function with the running cotangents — the reverse chain (stage
  recompute, transposed contractions, controller pullback, Hermite
  transpose) is derived by tracing, not hand-written, so it is
  consistent with the forward by construction. Save-window cotangent
  rows are consumed exactly once (accepted windows partition the span),
  so the save-buffer cotangent needs no threading — unconsumed rows pass
  through to the initial buffer (they hold the t<=t0 seeds).

Gradient contract: identical math to ops.ode's scan/adjoint engines
(same ``_stage_algebra``, ``_normed_scalars``, ``PIController.propose``),
pinned by tests. Scope: dynamics whose whole batch fits VMEM (the
latent-ODE AlternatingMLP and FFJORD CSL families). The 784-wide MNIST
flagship keeps the step-level fast adjoint (its stage stacks need batch
tiling); data-parallel solves also stay on the step path (per-step psum
cannot happen inside one kernel).

Reference parity: this replaces the OrdinaryDiffEq integrator loop +
SensitivityADPassThrough tape the reference drives per solve
(reference: src/models/neural_ode.jl:110-144, experiments/latent_ode.jl:225-269).
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from regneuralde_tpu.ops.controller import PIController, initial_step_size
from regneuralde_tpu.ops.ode import (
    ODESolution,
    ODEStats,
    StepTelemetry,
    _normed_scalars,
)
from regneuralde_tpu.ops.pallas_generic import _stage_algebra
from regneuralde_tpu.ops.tableaus import TSIT5

f32 = jnp.float32
i32 = jnp.int32

# Timing-only ablations of the forward kernel, comma-separated in
# REGNDE_WS_ABLATE: "nodma" skips the history stores/DMA, "notel" skips
# the telemetry stream stores, "fori:N" replaces the data-dependent
# while_loop with a FIXED N-iteration fori_loop (probes whether the
# per-step done-flag extraction — a vector->scalar pipeline sync — is
# what separates the forward from the counter-driven backward). Solves
# still produce the correct y1 (fori:N only if N >= the true step
# count), but the backward would read garbage history — set ONLY in perf
# probes, never in training or tests. Read at import time.
import os as _os

_ABLATE = frozenset(
    filter(None, _os.environ.get("REGNDE_WS_ABLATE", "").split(",")))


def _ablate_fori() -> int:
    """Fixed trip count requested via "fori:N", else 0 (use while)."""
    for a in _ABLATE:
        if a.startswith("fori:"):
            return int(a.split(":")[1])
    return 0

def _pad128(d: int) -> int:
    return ((d + 127) // 128) * 128


# Whole-solve kernels legitimately need more than Mosaic's 16MB default
# scoped-VMEM budget at flagship shapes. Round-5 re-measurement with the
# residual-streaming (no-replay) backward enabled (tools/probe_vmem_peak,
# batch 512 x dim 784, MLPDynamics hand pullback + double-buffered
# (2, n_ks*B, dpad)/(2, n_h*B, hpad) prefetch blocks): the flagship
# gradient compiles at an 88MB scoped limit and fails at 80MB — the
# replay's stage temporaries it dropped outweigh the added prefetch
# buffers (the pre-round-5 replay backward peaked at 104.8MB). v5e VMEM
# is 128MB/core; keep the limit at 112MB for ~24MB of measured headroom
# rather than shrinking the batch.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=112 * 2**20)


def vmem_estimate(batch: int, dim: int, n_save: int = 0) -> int:
    """Peak-VMEM bound for the monolithic backward kernel, calibrated
    against the round-5 Mosaic bisection (tools/probe_vmem_peak: the
    flagship batch 512 x dim 784 gradient fits an 88MB scoped limit and
    fails at 80MB, i.e. ~46 batch-row equivalents live: stage k's,
    hidden activations, their cotangents, the double-buffered residual
    prefetch blocks, and Mosaic's own copies), plus the aliased save
    buffer."""
    row = batch * _pad128(dim) * 4
    return 46 * row + n_save * row


def vmem_estimate_tiled(batch: int, dim: int, tile_rows: int = 64,
                        leaves_bytes: int = 0) -> int:
    """Peak-VMEM bound for the TILED backward kernel: four full-batch
    carry/scratch refs, one tile's worth of traced-vjp stage temporaries,
    and three copies of the parameter leaves (inputs + cotangent carry +
    per-tile vjp outputs). The per-tile constant is calibrated against a
    Mosaic-reported peak (26.9MB at batch 512 x dim 784, tile 64, MLP
    leaves): the traced vjp keeps ~70 tile-size arrays live (stage
    states, activations, hidden widths, and all their cotangents)."""
    row = batch * _pad128(dim) * 4
    tile_row = tile_rows * _pad128(dim) * 4
    return 4 * row + 72 * tile_row + 3 * leaves_bytes


def make_whole_solve(
    apply_fn: Callable,
    rtol: float,
    atol: float,
    *,
    controller: Optional[PIController] = None,
    max_steps: int,
    n_save: int = 0,
    interpret: Optional[bool] = None,
    algebra_bwd: Optional[Callable] = None,
    algebra_fwd_res: Optional[Callable] = None,
    n_real: Optional[int] = None,
    cache_residuals: bool = False,
):
    """Build ``solve(t0, t1, dt0, y0, f0, ys0, saveat, leaves)`` with a
    one-kernel forward and a one-kernel custom-vjp backward.

    ``apply_fn(t, y, leaves)`` is the dynamics over a flat list of 2-D
    leaves (the ``ops.pallas_generic`` convention); ``n_save`` is the
    static length of ``saveat`` (0 = final-state solve; then ``ys0`` and
    ``saveat`` must be ``()``). ``saveat`` must be sorted along the
    integration direction (ascending for t1 > t0) — the in-kernel save
    cursor walks it monotonically, same contract as ops.ode.odeint.

    Returns ``(y1, ys, tel, t_f, dt_f, qold_f, naccept, nreject, done)``
    with ``tel`` a ``StepTelemetry`` and ``ys`` shaped
    ``(n_save, batch, dim)`` (or ``()``).

    ``algebra_bwd(t, dt, y, k1, leaves, cts) -> (ct_t, ct_dt, ct_y,
    ct_k1, ct_leaves)`` optionally replaces the BACKWARD kernel's traced
    ``jax.vjp`` of the stage algebra with a hand-derived reverse chain
    (e.g. ops.pallas_mlp.make_normed_algebra_bwd). The traced transpose
    keeps ~20 batch-size residuals live, which Mosaic schedules ~3x
    slower than the hand chain at the flagship shape (measured round 4:
    152 vs ~50 us/trial-step); the forward kernel and the controller /
    telemetry / Hermite pullbacks are unchanged. Timing-only algebra
    ablations (REGNDE_ALG_ABLATE) force the traced path — the hand chain
    encodes the unablated math.

    ``n_real``: static count of real batch rows when the caller padded the
    batch to Mosaic's 8-row sublane alignment — the norm sums and the
    element count mask out pad rows so controller decisions match the
    unpadded solve (see ``_stage_algebra``).

    ``cache_residuals`` (requires both ``algebra_bwd`` and
    ``algebra_fwd_res``): the FORWARD kernel runs the residual-capturing
    algebra and streams each step's stage derivatives ``ks[1:]`` and
    hidden activations ``hs`` to HBM (delayed one iteration so the copy
    overlaps the next step's sweep); the BACKWARD kernel then skips the
    stage-sweep replay entirely — it recombines the controller/Hermite
    primals from the stored ks with pure lincombs
    (``pallas_generic._stage_algebra_from_ks``, bitwise-equal by
    construction) and feeds ``(ks, hs)`` straight into the hand pullback.
    Round-5 attribution: the replay was 2.37 ms of the flagship's 6.5 ms
    backward (42 steps); the recombination + residual DMA costs ~0.5 ms.
    """
    ctrl = controller or PIController.for_order(TSIT5.order)
    if cache_residuals and (algebra_bwd is None or algebra_fwd_res is None
                            or n_real is not None):
        raise ValueError(
            "cache_residuals requires algebra_bwd and algebra_fwd_res "
            "and an unpadded batch (n_real=None)")
    if n_real is not None and algebra_bwd is not None:
        # The hand-written algebra pullbacks don't take the pad mask;
        # padded solves transpose by tracing (correct either way, and
        # padded batches are not the flagship perf path).
        raise ValueError("n_real (padded batch) requires algebra_bwd=None")
    algebra = _stage_algebra(apply_fn, rtol, atol, n_real)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    from regneuralde_tpu.ops.pallas_generic import _ALG_ABLATE

    alg_for_bwd = algebra
    if algebra_bwd is not None and not _ALG_ABLATE:
        @jax.custom_vjp
        def _alg_cv(t, dt, y, k1, leaves):
            return algebra(t, dt, y, k1, leaves)

        if algebra_fwd_res is not None:
            # Residual-capturing forward: op-for-op identical primal
            # values to ``algebra`` (bitwise — the backward kernel's
            # replayed accept flags must match the forward kernel's
            # history), but the stage k's and hidden activations are
            # saved so the hand pullback skips its own stage recompute —
            # one full algebra sweep per reverse step instead of two.
            def _alg_cv_fwd(t, dt, y, k1, leaves):
                outs, stage_res = algebra_fwd_res(t, dt, y, k1, leaves)
                return outs, (t, dt, y, k1, leaves, stage_res)

            def _alg_cv_bwd(res, cts):
                t, dt, y, k1, leaves, stage_res = res
                ct_t, ct_dt, ct_y, ct_k1, ct_leaves = algebra_bwd(
                    t, dt, y, k1, leaves, cts, res=stage_res)
                return ct_t, ct_dt, ct_y, ct_k1, list(ct_leaves)
        else:
            def _alg_cv_fwd(t, dt, y, k1, leaves):
                return algebra(t, dt, y, k1, leaves), (t, dt, y, k1, leaves)

            def _alg_cv_bwd(res, cts):
                t, dt, y, k1, leaves = res
                ct_t, ct_dt, ct_y, ct_k1, ct_leaves = algebra_bwd(
                    t, dt, y, k1, leaves, cts)
                return ct_t, ct_dt, ct_y, ct_k1, list(ct_leaves)

        _alg_cv.defvjp(_alg_cv_fwd, _alg_cv_bwd)
        alg_for_bwd = _alg_cv

    def _make_trial_step(alg, variant="plain"):
        """One trial step as a pure function of loaded values — the
        unit both kernels share (the backward differentiates it with
        jax.vjp, so forward/backward stay op-for-op consistent; with
        ``algebra_bwd`` the algebra's pullback is the hand chain, the
        rest of the step still transposes by tracing).

        ``variant``: "plain" (alg returns the quintuple), "res" (alg is
        the residual-capturing forward; trial_step additionally returns
        the stage residuals for the forward kernel to store), "cached"
        (alg takes stored ``(ks, hs)`` as two extra trailing arguments —
        the backward kernel's no-replay path)."""

        def post(t, dt, qold, y, f0, t1, span, tdir, count, sweep_outs,
                 is_last, dt_eff):
            y_new, k7, e, n, d = sweep_outs
            eest, eigen = _normed_scalars(e, n, d, count, f32)
            accept = eest <= 1.0
            # Controller update on (1,1) vectors: Mosaic's scalar core has
            # no powf lowering, so `eest**beta1` must run on the VPU.
            dt_next, qold_next = ctrl.propose(
                jnp.reshape(dt_eff, (1, 1)), jnp.reshape(eest, (1, 1)),
                jnp.reshape(qold, (1, 1)), jnp.reshape(accept, (1, 1)))
            dt_next = dt_next[0, 0]
            qold_next = qold_next[0, 0]
            dt_next = jnp.sign(dt_next) * jnp.minimum(jnp.abs(dt_next), span)
            t_new = jnp.where(accept, jnp.where(is_last, t1, t + dt_eff), t)
            y_out = jnp.where(accept, y_new, y)
            f0_out = jnp.where(accept, k7, f0)
            tel_t = jnp.where(is_last, t1, t + dt_eff)
            acc_f = accept.astype(f32)
            done_f = (accept & is_last).astype(f32)
            return (t_new, dt_next, qold_next, y_out, f0_out,
                    tel_t, dt_eff, eest, eigen, acc_f, done_f)

        if variant == "cached":
            def trial_step(t, dt, qold, y, f0, t1, span, tdir, count,
                           leaves, ks, hs):
                remaining = t1 - t
                is_last = (dt - remaining) * tdir >= 0
                dt_eff = jnp.where(is_last, remaining, dt)
                outs = alg(t, dt_eff, y, f0, leaves, ks, hs)
                return post(t, dt, qold, y, f0, t1, span, tdir, count,
                            outs, is_last, dt_eff)
        elif variant == "res":
            def trial_step(t, dt, qold, y, f0, t1, span, tdir, count,
                           leaves):
                remaining = t1 - t
                is_last = (dt - remaining) * tdir >= 0
                dt_eff = jnp.where(is_last, remaining, dt)
                outs, stage_res = alg(t, dt_eff, y, f0, leaves)
                return post(t, dt, qold, y, f0, t1, span, tdir, count,
                            outs, is_last, dt_eff), stage_res
        else:
            def trial_step(t, dt, qold, y, f0, t1, span, tdir, count,
                           leaves):
                remaining = t1 - t
                is_last = (dt - remaining) * tdir >= 0
                dt_eff = jnp.where(is_last, remaining, dt)
                outs = alg(t, dt_eff, y, f0, leaves)
                return post(t, dt, qold, y, f0, t1, span, tdir, count,
                            outs, is_last, dt_eff)

        return trial_step

    trial_step = _make_trial_step(algebra)
    trial_step_bwd = _make_trial_step(alg_for_bwd)

    trial_step_res = None
    trial_step_cached = None
    use_cache = cache_residuals and not _ALG_ABLATE
    if use_cache:
        from regneuralde_tpu.ops.pallas_generic import _stage_algebra_from_ks

        recombine = _stage_algebra_from_ks(rtol, atol)

        @jax.custom_vjp
        def _alg_cached(t, dt, y, k1, leaves, ks, hs):
            return recombine(t, dt, y, k1, ks)

        def _alg_cached_fwd(t, dt, y, k1, leaves, ks, hs):
            return (recombine(t, dt, y, k1, ks),
                    (t, dt, y, k1, leaves, ks, hs))

        def _alg_cached_bwd(res, cts):
            t, dt, y, k1, leaves, ks, hs = res
            # (ks, hs) are caches of the algebra's own intermediates —
            # the hand pullback already charges their dependence on
            # (t, dt, y, k1, leaves), so their direct cotangent is zero.
            ct_t, ct_dt, ct_y, ct_k1, ct_leaves = algebra_bwd(
                t, dt, y, k1, leaves, cts,
                res=((k1,) + tuple(ks), tuple(hs)))
            return (ct_t, ct_dt, ct_y, ct_k1, list(ct_leaves),
                    tuple(jnp.zeros_like(k) for k in ks),
                    tuple(jnp.zeros_like(h) for h in hs))

        _alg_cached.defvjp(_alg_cached_fwd, _alg_cached_bwd)
        trial_step_res = _make_trial_step(algebra_fwd_res, variant="res")
        trial_step_cached = _make_trial_step(_alg_cached, variant="cached")

    def _hermite_row(th, dt_eff, y, y_new, f0, k7):
        """Cubic Hermite at scalar fraction ``th`` on one (batch, dim) row.
        Matches ops.ode._hermite_eval's formula."""
        dy = y_new - y
        return (
            (1 - th) * y
            + th * y_new
            + th * (th - 1) * (
                (1 - 2 * th) * dy
                + (th - 1) * dt_eff * f0
                + th * dt_eff * k7
            )
        )

    # ------------------------------------------------------------------
    # forward kernel
    # ------------------------------------------------------------------

    def make_fwd_kernel(n_leaves, res_dims=None):
        def kernel(*refs):
            k = 0
            t0r = refs[k]; k += 1
            t1r = refs[k]; k += 1
            dt0r = refs[k]; k += 1
            y0r = refs[k]; k += 1
            f0r = refs[k]; k += 1
            if n_save:
                sar = refs[k]; k += 1     # SMEM (n_save,) sorted save times
                cur0r = refs[k]; k += 1   # SMEM (1,1) i32: rows at/before t0
                ys0r = refs[k]; k += 1
            leaf_refs = refs[k:k + n_leaves]; k += n_leaves
            y1r = refs[k]; k += 1
            if n_save:
                ysr = refs[k]; k += 1
            telt = refs[k]; k += 1
            teldt = refs[k]; k += 1
            tele = refs[k]; k += 1
            telg = refs[k]; k += 1
            telacc = refs[k]; k += 1
            ht = refs[k]; k += 1
            hdt = refs[k]; k += 1
            hqold = refs[k]; k += 1
            tfr = refs[k]; k += 1
            dtfr = refs[k]; k += 1
            qoldfr = refs[k]; k += 1
            nar = refs[k]; k += 1
            nrr = refs[k]; k += 1
            doner = refs[k]; k += 1
            curfr = refs[k]; k += 1
            hyr = refs[k]; k += 1
            hfr = refs[k]; k += 1
            if res_dims is not None:
                hksr = refs[k]; k += 1   # HBM (max_steps, n_ks*B, dpad)
                hhsr = refs[k]; k += 1   # HBM (max_steps, n_h*B, hpad)
            cpy = refs[k]; k += 1
            cpf = refs[k]; k += 1
            sem = refs[k]; k += 1
            if res_dims is not None:
                cks = refs[k]; k += 1    # VMEM (n_ks*B, dpad) scratch
                chs = refs[k]; k += 1    # VMEM (n_h*B, hpad) scratch
                sem2 = refs[k]; k += 1

            t0 = t0r[0, 0]
            t1 = t1r[0, 0]
            dt0 = dt0r[0, 0]
            tdir = jnp.sign(t1 - t0)
            span = jnp.abs(t1 - t0)
            leaves = [r[:] for r in leaf_refs]
            y0 = y0r[:]
            dim = y0.shape[-1]
            count = jnp.asarray(
                float((n_real or y0.shape[0]) * y0.shape[1]), f32)
            # ysr is input/output-aliased with ys0r: rows already hold
            # the initial seeds; nothing to copy. Saveat is consumed via a
            # monotone CURSOR (save times are sorted and accepted windows
            # tile (t0, t]): per step, ONE scalar compare decides whether
            # any row fires, and the Hermite work runs exactly n_save
            # times per solve — the previous chunked-mask design burned
            # ~n_save/4 vector masks + anys per step.
            cur0 = cur0r[0, 0] if n_save else jnp.asarray(0, i32)

            # Streams are NOT zero-initialized in-kernel: a fori_loop of
            # max_steps scalar SMEM stores costs ~1.2ms on the scalar core
            # (measured round 3). Rows beyond the executed step count hold
            # garbage; the XLA-side wrapper masks them with the returned
            # na+nr (the backward only ever reads rows < ns).

            def cond(c):
                return (c[6] == 0) & (c[0] < max_steps)

            store_res = res_dims is not None and "nodma" not in _ABLATE

            def body(c):
                if n_save:
                    i, t, dt, qold, na, nr, done, cur, y, f0 = c
                else:
                    i, t, dt, qold, na, nr, done, y, f0 = c
                if "nodma" not in _ABLATE:
                    ht[i] = t
                    hdt[i] = dt
                    hqold[i] = qold
                    cpy[:, :dim] = y
                    cpf[:, :dim] = f0
                    d1 = pltpu.make_async_copy(cpy, hyr.at[i], sem.at[0])
                    d2 = pltpu.make_async_copy(cpf, hfr.at[i], sem.at[1])
                    d1.start()
                    d2.start()
                if store_res:
                    # Delayed-by-one residual stream: the scratch still
                    # holds step i-1's stage residuals (written at the end
                    # of the previous body), so its HBM copy overlaps THIS
                    # step's sweep; the wait below lands before the
                    # scratch is overwritten.
                    @pl.when(i > 0)
                    def _():
                        pltpu.make_async_copy(
                            cks, hksr.at[i - 1], sem2.at[0]).start()
                        pltpu.make_async_copy(
                            chs, hhsr.at[i - 1], sem2.at[1]).start()
                if res_dims is not None:
                    ((t_new, dt_next, qold_next, y_out, f0_out, tel_t,
                      dt_eff, eest, eigen, acc_f, done_f),
                     stage_res) = trial_step_res(
                        t, dt, qold, y, f0, t1, span, tdir, count, leaves)
                else:
                    (t_new, dt_next, qold_next, y_out, f0_out, tel_t,
                     dt_eff, eest, eigen, acc_f, done_f) = trial_step(
                        t, dt, qold, y, f0, t1, span, tdir, count, leaves)
                if n_save:
                    # y_out/f0_out equal (y_new, k7) when accepted, so they
                    # are valid interpolation primals inside the accepted
                    # branch. tel_t is the accepted step's endpoint, so the
                    # cursor consumes every save time in (t, tel_t].
                    def save_cond(cu):
                        sa_c = sar[jnp.minimum(cu, n_save - 1)]
                        return (cu < n_save) & (
                            (sa_c - tel_t) * tdir <= 0.0)

                    def save_body(cu):
                        th = (sar[cu] - t) / jnp.where(
                            dt_eff == 0.0, 1.0, dt_eff)
                        row = _hermite_row(th, dt_eff, y, y_out, f0, f0_out)
                        ysr[pl.ds(cu, 1)] = row[None]
                        return cu + 1

                    cur = lax.cond(
                        acc_f > 0.5,
                        lambda cu: lax.while_loop(save_cond, save_body, cu),
                        lambda cu: cu, cur)
                if "notel" not in _ABLATE:
                    telt[i] = tel_t
                    teldt[i] = dt_eff
                    tele[i] = eest
                    telg[i] = eigen
                    telacc[i] = acc_f
                if "nodma" not in _ABLATE:
                    d1.wait()
                    d2.wait()
                if store_res:
                    @pl.when(i > 0)
                    def _():
                        pltpu.make_async_copy(
                            cks, hksr.at[i - 1], sem2.at[0]).wait()
                        pltpu.make_async_copy(
                            chs, hhsr.at[i - 1], sem2.at[1]).wait()
                    ks_t, hs_t = stage_res
                    bsz = y0.shape[0]
                    hdim = hs_t[0].shape[-1]
                    for j in range(len(ks_t) - 1):
                        cks[j * bsz:(j + 1) * bsz, :dim] = ks_t[j + 1]
                    for j in range(len(hs_t)):
                        chs[j * bsz:(j + 1) * bsz, :hdim] = hs_t[j]
                acc_i = acc_f.astype(i32)
                tail = (cur,) if n_save else ()
                return (i + 1, t_new.astype(f32), dt_next.astype(f32),
                        qold_next.astype(f32), na + acc_i, nr + 1 - acc_i,
                        (done_f > 0).astype(i32)) + tail + (y_out, f0_out)

            done0 = (span == 0.0).astype(i32)
            init = (jnp.asarray(0, i32), t0, dt0,
                    jnp.asarray(ctrl.qoldinit, f32), jnp.asarray(0, i32),
                    jnp.asarray(0, i32), done0)
            init += ((cur0,) if n_save else ()) + (y0, f0r[:])
            nfix = _ablate_fori()
            if nfix:  # timing probe: counter-driven loop, no done checks
                fin = lax.fori_loop(0, nfix, lambda _, c: body(c), init)
            else:
                fin = lax.while_loop(cond, body, init)
            if store_res:
                # Flush the LAST executed step's residuals (its delayed
                # copy never fired inside the loop).
                nsf = fin[0]

                @pl.when(nsf > 0)
                def _():
                    pltpu.make_async_copy(
                        cks, hksr.at[nsf - 1], sem2.at[0]).start()
                    pltpu.make_async_copy(
                        chs, hhsr.at[nsf - 1], sem2.at[1]).start()
                    pltpu.make_async_copy(
                        cks, hksr.at[nsf - 1], sem2.at[0]).wait()
                    pltpu.make_async_copy(
                        chs, hhsr.at[nsf - 1], sem2.at[1]).wait()
            t, dt, qold, na, nr, done = fin[1:7]
            y = fin[-2]
            y1r[:] = y
            tfr[0, 0] = t
            dtfr[0, 0] = dt
            qoldfr[0, 0] = qold
            nar[0, 0] = na
            nrr[0, 0] = nr
            doner[0, 0] = done
            curfr[0, 0] = fin[7] if n_save else jnp.asarray(0, i32)

        return kernel

    # ------------------------------------------------------------------
    # backward kernel
    # ------------------------------------------------------------------

    def make_bwd_kernel(n_leaves, leaf_shapes, batch, dim, res_dims=None):
        dpad = _pad128(dim)

        def kernel(*refs):
            k = 0
            t0r = refs[k]; k += 1
            t1r = refs[k]; k += 1
            nsr = refs[k]; k += 1
            cttfr = refs[k]; k += 1
            ctdtfr = refs[k]; k += 1
            ctqoldfr = refs[k]; k += 1
            ht = refs[k]; k += 1
            hdt = refs[k]; k += 1
            hqold = refs[k]; k += 1
            cttelt = refs[k]; k += 1
            ctteldt = refs[k]; k += 1
            cttele = refs[k]; k += 1
            cttelg = refs[k]; k += 1
            cty1r = refs[k]; k += 1
            if n_save:
                sar = refs[k]; k += 1     # SMEM (n_save,)
                cur0r = refs[k]; k += 1   # SMEM (1,1) i32
                curfr = refs[k]; k += 1   # SMEM (1,1) i32
                ctysr_in = refs[k]; k += 1
            leaf_refs = refs[k:k + n_leaves]; k += n_leaves
            hyr = refs[k]; k += 1
            hfr = refs[k]; k += 1
            if res_dims is not None:
                hksr = refs[k]; k += 1
                hhsr = refs[k]; k += 1
            # outputs
            cty0r = refs[k]; k += 1
            ctf0r = refs[k]; k += 1
            if n_save:
                ctys0r = refs[k]; k += 1  # aliased with ctysr_in
            ctleaf_refs = refs[k:k + n_leaves]; k += n_leaves
            ctt0r = refs[k]; k += 1
            ctt1r = refs[k]; k += 1
            ctdt0r = refs[k]; k += 1
            ldy = refs[k]; k += 1
            ldf = refs[k]; k += 1
            sem = refs[k]; k += 1
            if res_dims is not None:
                # Double-buffered: ldy/ldf become (2, B, dpad) and every
                # per-step HBM stream (y, f0, ks, hs) is prefetched one
                # iteration ahead, overlapping the pullback.
                semf = refs[k]; k += 1
                ldks = refs[k]; k += 1   # VMEM (2, n_ks*B, dpad)
                ldhs = refs[k]; k += 1   # VMEM (2, n_h*B, hpad)
                semk = refs[k]; k += 1   # DMA (2,) one per slot
                semh = refs[k]; k += 1

            t0 = t0r[0, 0]
            t1 = t1r[0, 0]
            ns = nsr[0, 0]
            tdir = jnp.sign(t1 - t0)
            span = jnp.abs(t1 - t0)
            leaves = [r[:] for r in leaf_refs]
            count = jnp.asarray(float((n_real or batch) * dim), f32)
            cur0v = cur0r[0, 0] if n_save else jnp.asarray(0, i32)
            rcur0 = curfr[0, 0] if n_save else jnp.asarray(0, i32)

            step_fn = lambda t_, dt_, q_, y_, f_, t1_, sp_, ls_: (
                trial_step_bwd(
                    t_, dt_, q_, y_, f_, t1_, sp_, tdir, count, ls_))
            step_fn_cached = lambda t_, dt_, q_, y_, f_, t1_, sp_, ls_, \
                ks_, hs_: trial_step_cached(
                    t_, dt_, q_, y_, f_, t1_, sp_, tdir, count, ls_,
                    ks_, hs_)

            ct_leaves0 = tuple(jnp.zeros(s, f32) for s in leaf_shapes)
            carry0 = (
                cttfr[0, 0], ctdtfr[0, 0], ctqoldfr[0, 0],
                cty1r[:], jnp.zeros((batch, dim), f32),
                jnp.zeros((), f32), jnp.zeros((), f32),
                rcur0,
            ) + ct_leaves0

            def body(j, c):
                (ct_t, ct_dt, ct_qold, ct_y, ct_f0, ct_t1a, ct_spana,
                 rcur) = c[:8]
                ct_ls = c[8:]
                i = ns - 1 - j
                t_i = ht[i]
                dt_i = hdt[i]
                qold_i = hqold[i]
                if "nobwddma" in _ABLATE:
                    # Timing-only ablation: skip the per-step history
                    # loads (gradients are garbage; never set outside
                    # perf probes — see _ABLATE docs above).
                    y_i = jnp.full((batch, dim), 0.5, f32)
                    f0_i = jnp.full((batch, dim), 0.5, f32)
                elif res_dims is not None:
                    # Double-buffered with the residual stream below:
                    # this row's copy was started one iteration ago.
                    slot0 = lax.rem(j, 2)
                    pltpu.make_async_copy(
                        hyr.at[i], ldy.at[slot0], sem.at[slot0]).wait()
                    pltpu.make_async_copy(
                        hfr.at[i], ldf.at[slot0], semf.at[slot0]).wait()

                    @pl.when(i > 0)
                    def _():
                        ns0 = lax.rem(j + 1, 2)
                        pltpu.make_async_copy(
                            hyr.at[i - 1], ldy.at[ns0],
                            sem.at[ns0]).start()
                        pltpu.make_async_copy(
                            hfr.at[i - 1], ldf.at[ns0],
                            semf.at[ns0]).start()

                    y_i = ldy[slot0, :, :dim]
                    f0_i = ldf[slot0, :, :dim]
                else:
                    d1 = pltpu.make_async_copy(hyr.at[i], ldy, sem.at[0])
                    d2 = pltpu.make_async_copy(hfr.at[i], ldf, sem.at[1])
                    d1.start()
                    d2.start()
                    d1.wait()
                    d2.wait()
                    y_i = ldy[:, :dim]
                    f0_i = ldf[:, :dim]

                if "bwdskel" in _ABLATE or "bwdreplay" in _ABLATE:
                    # Timing-only backward ablations (gradients are
                    # garbage; perf probes only, n_save=0):
                    #   bwdskel   — no replay, no pullback: isolates the
                    #               reverse loop + history DMA + carry.
                    #   bwdreplay — forward replay of the trial step but
                    #               no pullback: adds the 1x stage sweep.
                    # Tiny-coefficient mixes keep every input live so
                    # Mosaic cannot dead-code the structure under study.
                    if "bwdreplay" in _ABLATE:
                        outs = step_fn(t_i, dt_i, qold_i, y_i, f0_i, t1,
                                       span, list(leaves))
                        (_tn, _dtn, _qn, y_out, f0_out, _telt, dt_eff,
                         _e, _g, acc_f, _df) = outs
                    else:
                        y_out, f0_out = y_i, f0_i
                        dt_eff = dt_i
                        acc_f = jnp.ones((), f32)
                    c999 = jnp.float32(0.999)
                    eps = jnp.float32(1e-20)
                    d_t = ct_t * c999 + dt_eff * eps
                    d_dt = ct_dt * c999 + cttelt[i] * eps
                    d_q = ct_qold * c999
                    d_y = ct_y * c999 + y_out * eps
                    d_f = ct_f0 * c999 + f0_out * eps
                    d_t1 = jnp.zeros((), f32)
                    d_sp = jnp.zeros((), f32)
                    d_ls = [l * eps for l in leaves]
                    return (
                        d_t, d_dt, d_q, d_y, d_f,
                        ct_t1a + d_t1, ct_spana + d_sp, rcur,
                    ) + tuple(a + b for a, b in zip(ct_ls, d_ls))

                if res_dims is not None:
                    # No-replay path: the stored stage residuals stream
                    # in DOUBLE-BUFFERED (this row's copy was started by
                    # the previous iteration / the pre-loop prologue, so
                    # it overlapped that step's pullback); the hand
                    # pullback consumes (ks, hs) directly and the
                    # primals recombine from ks with pure lincombs.
                    n_ks, n_h, hdim = res_dims
                    slot = lax.rem(j, 2)
                    pltpu.make_async_copy(
                        hksr.at[i], ldks.at[slot], semk.at[slot]).wait()
                    pltpu.make_async_copy(
                        hhsr.at[i], ldhs.at[slot], semh.at[slot]).wait()

                    @pl.when(i > 0)
                    def _():
                        nslot = lax.rem(j + 1, 2)
                        pltpu.make_async_copy(
                            hksr.at[i - 1], ldks.at[nslot],
                            semk.at[nslot]).start()
                        pltpu.make_async_copy(
                            hhsr.at[i - 1], ldhs.at[nslot],
                            semh.at[nslot]).start()

                    ks_v = tuple(
                        ldks[slot, jj * batch:(jj + 1) * batch, :dim]
                        for jj in range(n_ks))
                    hs_v = tuple(
                        ldhs[slot, jj * batch:(jj + 1) * batch, :hdim]
                        for jj in range(n_h))
                    outs, vjp = jax.vjp(
                        step_fn_cached, t_i, dt_i, qold_i, y_i, f0_i,
                        t1, span, list(leaves), ks_v, hs_v)
                else:
                    outs, vjp = jax.vjp(step_fn, t_i, dt_i, qold_i, y_i,
                                        f0_i, t1, span, list(leaves))
                (_tn, _dtn, _qn, y_out, f0_out, _telt, dt_eff, _e, _g,
                 acc_f, _df) = outs

                di_t = jnp.zeros((), f32)
                di_dteff = jnp.zeros((), f32)
                di_y = jnp.zeros((batch, dim), f32)
                di_ynew = jnp.zeros((batch, dim), f32)
                di_f0 = jnp.zeros((batch, dim), f32)
                di_k7 = jnp.zeros((batch, dim), f32)
                if n_save:
                    # Reverse cursor: save rows were consumed in ascending
                    # order by accepted windows (t, t_end]; walking steps in
                    # reverse, this step owns rows rcur-1, rcur-2, ... while
                    # their save time is strictly above the step start t_i.
                    # Rejected steps consume nothing (acc_b gates the walk);
                    # per step the non-firing cost is ONE scalar compare.
                    acc_b = acc_f > 0.5

                    def save_cond(c):
                        r = c[0]
                        sa_r = sar[jnp.maximum(r - 1, 0)]
                        return acc_b & (r > cur0v) & (
                            (sa_r - t_i) * tdir > 0.0)

                    def save_body(c):
                        r, a_t, a_dt, a_y, a_yn, a_f0, a_k7 = c
                        sa_r = sar[r - 1]
                        ct_row = ctysr_in[pl.ds(r - 1, 1)][0]

                        def herm(t_, dte, yy, yn, ff, kk):
                            th = (sa_r - t_) / jnp.where(
                                dte == 0.0, 1.0, dte)
                            return _hermite_row(th, dte, yy, yn, ff, kk)

                        _, hvjp = jax.vjp(herm, t_i, dt_eff, y_i, y_out,
                                          f0_i, f0_out)
                        h_t, h_dt, h_y, h_yn, h_f0, h_k7 = hvjp(ct_row)
                        return (r - 1, a_t + h_t, a_dt + h_dt, a_y + h_y,
                                a_yn + h_yn, a_f0 + h_f0, a_k7 + h_k7)

                    (rcur, di_t, di_dteff, di_y, di_ynew, di_f0,
                     di_k7) = lax.while_loop(
                        save_cond, save_body,
                        (rcur, di_t, di_dteff, di_y, di_ynew, di_f0,
                         di_k7))

                seeds = (
                    ct_t, ct_dt, ct_qold,
                    ct_y + di_ynew,        # y_out (== y_new when accepted)
                    ct_f0 + di_k7,         # f0_out (== k7 when accepted)
                    cttelt[i],
                    ctteldt[i] + di_dteff,
                    cttele[i], cttelg[i],
                    jnp.zeros((), f32), jnp.zeros((), f32),
                )
                if res_dims is not None:
                    (d_t, d_dt, d_q, d_y, d_f, d_t1, d_sp, d_ls,
                     _d_ks, _d_hs) = vjp(seeds)
                else:
                    (d_t, d_dt, d_q, d_y, d_f, d_t1, d_sp, d_ls) = vjp(
                        seeds)
                return (
                    d_t + di_t, d_dt, d_q, d_y + di_y, d_f + di_f0,
                    ct_t1a + d_t1, ct_spana + d_sp, rcur,
                ) + tuple(a + b for a, b in zip(ct_ls, d_ls))

            if res_dims is not None:
                # Prologue for the double-buffered streams: iteration
                # j waits on slot j%2, so prime slot 0 with the last
                # executed row before entering the loop.
                @pl.when(ns > 0)
                def _():
                    pltpu.make_async_copy(
                        hyr.at[ns - 1], ldy.at[0], sem.at[0]).start()
                    pltpu.make_async_copy(
                        hfr.at[ns - 1], ldf.at[0], semf.at[0]).start()
                    pltpu.make_async_copy(
                        hksr.at[ns - 1], ldks.at[0], semk.at[0]).start()
                    pltpu.make_async_copy(
                        hhsr.at[ns - 1], ldhs.at[0], semh.at[0]).start()

            out = lax.fori_loop(0, ns, body, carry0)
            (ct_t, ct_dt, _ct_qold, ct_y, ct_f0, ct_t1a, ct_spana,
             _rcur) = out[:8]
            ct_ls = out[8:]
            cty0r[:] = ct_y
            ctf0r[:] = ct_f0
            if n_save:
                # ctys0r is aliased with ctysr_in: unconsumed rows (the
                # t<=t0 seeds below cur0, and rows past curf when the solve
                # failed) pass through in place; only the rows consumed by
                # interpolation — exactly [cur0, curf) — are zeroed.
                def zero_row(r, _):
                    ctys0r[pl.ds(r, 1)] = jnp.zeros((1, batch, dim), f32)
                    return 0

                lax.fori_loop(cur0v, rcur0, zero_row, 0)
            for r, v in zip(ctleaf_refs, ct_ls):
                r[:] = v
            ctt0r[0, 0] = ct_t - tdir * ct_spana
            ctt1r[0, 0] = ct_t1a + tdir * ct_spana
            ctdt0r[0, 0] = ct_dt

        return kernel

    # ------------------------------------------------------------------
    # jax-level wrappers
    # ------------------------------------------------------------------

    smem11 = lambda dt_: pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)

    def _s(x):
        return jnp.reshape(jnp.asarray(x, f32), (1, 1))

    def _res_dims(y0, f0, leaves):
        """(n_ks_stored, n_h, hdim) from the residual-capturing algebra's
        abstract output — dynamics-agnostic shape inference."""
        sds = jax.ShapeDtypeStruct
        s0 = sds((), f32)
        _, (ks_sd, hs_sd) = jax.eval_shape(
            algebra_fwd_res, s0, s0, sds(y0.shape, y0.dtype),
            sds(f0.shape, f0.dtype),
            [sds(l.shape, l.dtype) for l in leaves])
        return len(ks_sd) - 1, len(hs_sd), hs_sd[0].shape[-1]

    def _forward(t0, t1, dt0, y0, f0, ys0, saveat, leaves):
        batch, dim = y0.shape
        dpad = _pad128(dim)
        n_leaves = len(leaves)
        res_dims = _res_dims(y0, f0, leaves) if use_cache else None
        ins = [_s(t0), _s(t1), _s(dt0), y0, f0]
        in_specs = [smem11(f32)] * 3 + [vmem, vmem]
        aliases = {}
        if n_save:
            sa1 = jnp.asarray(saveat, f32)
            tdir = jnp.sign(jnp.asarray(t1, f32) - jnp.asarray(t0, f32))
            cur0 = jnp.reshape(jnp.sum(
                ((sa1 - t0) * tdir <= 0).astype(i32)), (1, 1))
            ins += [sa1, cur0, ys0]
            in_specs += [smem11(f32), smem11(i32), vmem]
            aliases[7] = 1  # ys0 -> ys output (in-place row updates)
        ins += list(leaves)
        in_specs += [vmem] * n_leaves

        outs_shape = [jax.ShapeDtypeStruct((batch, dim), y0.dtype)]
        out_specs = [vmem]
        if n_save:
            outs_shape.append(jax.ShapeDtypeStruct((n_save, batch, dim),
                                                   y0.dtype))
            out_specs.append(vmem)
        # telemetry + history scalar streams: 1-D SMEM — a (max_steps, 1)
        # window pads its minor dim to 128 lanes (128KB of SMEM each)
        outs_shape += [jax.ShapeDtypeStruct((max_steps,), f32)] * 8
        out_specs += [smem11(f32)] * 8
        # final scalars (tf, dtf, qoldf, na, nr, done, curf)
        outs_shape += [jax.ShapeDtypeStruct((1, 1), f32)] * 3
        outs_shape += [jax.ShapeDtypeStruct((1, 1), i32)] * 4
        out_specs += [smem11(f32)] * 7
        # HBM history
        outs_shape += [jax.ShapeDtypeStruct((max_steps, batch, dpad), f32)] * 2
        out_specs += [anym, anym]
        scratch = [
            pltpu.VMEM((batch, dpad), f32),
            pltpu.VMEM((batch, dpad), f32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        if use_cache:
            n_ks, n_h, hdim = res_dims
            hpad = _pad128(hdim)
            outs_shape += [
                jax.ShapeDtypeStruct((max_steps, n_ks * batch, dpad), f32),
                jax.ShapeDtypeStruct((max_steps, n_h * batch, hpad), f32),
            ]
            out_specs += [anym, anym]
            scratch += [
                pltpu.VMEM((n_ks * batch, dpad), f32),
                pltpu.VMEM((n_h * batch, hpad), f32),
                pltpu.SemaphoreType.DMA((2,)),
            ]

        res = pl.pallas_call(
            make_fwd_kernel(n_leaves, res_dims),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=outs_shape,
            scratch_shapes=scratch,
            input_output_aliases=aliases,
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(*ins)
        k = 0
        y1 = res[k]; k += 1
        ys = None
        if n_save:
            ys = res[k]; k += 1
        (telt, teldt, tele, telg, telacc,
         ht, hdt, hqold) = res[k:k + 8]; k += 8
        tf, dtf, qoldf, na, nr, done, curf = res[k:k + 7]; k += 7
        hy, hf = res[k:k + 2]; k += 2
        hres = res[k:k + 2] if use_cache else ()
        # Rows beyond the executed step count are UNINITIALIZED (the kernel
        # skips the costly in-kernel zeroing); mask them here so downstream
        # masked reductions (values * mask) never touch garbage/NaN.
        live = jnp.arange(max_steps, dtype=i32) < (na[0, 0] + nr[0, 0])
        zf = jnp.zeros((), f32)
        tel = StepTelemetry(
            t=jnp.where(live, telt, zf),
            dt=jnp.where(live, teldt, zf),
            eest=jnp.where(live, tele, zf),
            eigen_est=jnp.where(live, telg, zf),
            accepted=jnp.where(live, telacc, zf) > 0.5,
            live=live,
        )
        outs = (y1, ys if n_save else (), tel, tf[0, 0], dtf[0, 0],
                qoldf[0, 0], na[0, 0], nr[0, 0], done[0, 0] > 0)
        resid = (ht, hdt, hqold, hy, hf, na[0, 0] + nr[0, 0], curf, hres)
        return outs, resid

    @jax.custom_vjp
    def solve(t0, t1, dt0, y0, f0, ys0, saveat, leaves):
        outs, _ = _forward(t0, t1, dt0, y0, f0, ys0, saveat, leaves)
        return outs

    def solve_fwd(t0, t1, dt0, y0, f0, ys0, saveat, leaves):
        outs, resid = _forward(t0, t1, dt0, y0, f0, ys0, saveat, leaves)
        return outs, (resid, outs[2], t0, t1, y0, f0, ys0, saveat, leaves)

    def _mat(ct, like):
        if ct is None or (hasattr(ct, "dtype")
                          and ct.dtype == jax.dtypes.float0):
            return jnp.zeros(jnp.shape(like), jnp.result_type(like, f32))
        return ct

    def solve_bwd(res, cts):
        # custom_vjp backwards trace OUTSIDE the forward's
        # default_matmul_precision context (see ops.pallas_sde's
        # solve_bwd for the measured failure). Today every contraction
        # in this kernel's reverse chain carries explicit
        # precision=HIGHEST (pallas_mlp/pallas_generic), so this context
        # changes nothing — it guards any future ambient-precision dot.
        with jax.default_matmul_precision("highest"):
            return _solve_bwd_impl(res, cts)

    def _solve_bwd_impl(res, cts):
        (resid, tel, t0, t1, y0, f0, ys0, saveat, leaves) = res
        ht, hdt, hqold, hy, hf, nsteps, curf, hres = resid
        (ct_y1, ct_ys, ct_tel, ct_tf, ct_dtf, ct_qoldf,
         _na, _nr, _done) = cts
        batch, dim = y0.shape
        dpad = _pad128(dim)
        n_leaves = len(leaves)
        res_dims = _res_dims(y0, f0, leaves) if use_cache else None
        zs = jnp.zeros((max_steps,), f32)

        ins = [
            _s(t0), _s(t1),
            jnp.reshape(jnp.asarray(nsteps, i32), (1, 1)),
            _s(_mat(ct_tf, 0.0)), _s(_mat(ct_dtf, 0.0)),
            _s(_mat(ct_qoldf, 0.0)),
            ht, hdt, hqold,
            _mat(ct_tel.t, zs), _mat(ct_tel.dt, zs),
            _mat(ct_tel.eest, zs), _mat(ct_tel.eigen_est, zs),
            _mat(ct_y1, y0),
        ]
        in_specs = ([smem11(f32)] * 2 + [smem11(i32)] + [smem11(f32)] * 3
                    + [smem11(f32)] * 7 + [vmem])
        aliases = {}
        if n_save:
            sa1 = jnp.asarray(saveat, f32)
            tdir = jnp.sign(jnp.asarray(t1, f32) - jnp.asarray(t0, f32))
            cur0 = jnp.reshape(jnp.sum(
                ((sa1 - t0) * tdir <= 0).astype(i32)), (1, 1))
            ins += [sa1, cur0, curf, _mat(ct_ys, ys0)]
            in_specs += [smem11(f32), smem11(i32), smem11(i32), vmem]
            aliases[17] = 2  # ct_ys -> ct_ys0 output
        ins += list(leaves)
        in_specs += [vmem] * n_leaves
        ins += [hy, hf]
        in_specs += [anym, anym]
        if use_cache:
            ins += list(hres)
            in_specs += [anym, anym]

        outs_shape = [jax.ShapeDtypeStruct((batch, dim), f32),
                      jax.ShapeDtypeStruct((batch, dim), f32)]
        out_specs = [vmem, vmem]
        if n_save:
            outs_shape.append(jax.ShapeDtypeStruct((n_save, batch, dim), f32))
            out_specs.append(vmem)
        leaf_shapes = tuple(tuple(l.shape) for l in leaves)
        outs_shape += [jax.ShapeDtypeStruct(s, f32) for s in leaf_shapes]
        out_specs += [vmem] * n_leaves
        outs_shape += [jax.ShapeDtypeStruct((1, 1), f32)] * 3
        out_specs += [smem11(f32)] * 3
        if use_cache:
            n_ks, n_h, hdim = res_dims
            scratch = [
                pltpu.VMEM((2, batch, dpad), f32),
                pltpu.VMEM((2, batch, dpad), f32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, n_ks * batch, dpad), f32),
                pltpu.VMEM((2, n_h * batch, _pad128(hdim)), f32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            scratch = [
                pltpu.VMEM((batch, dpad), f32),
                pltpu.VMEM((batch, dpad), f32),
                pltpu.SemaphoreType.DMA((2,)),
            ]

        res_b = pl.pallas_call(
            make_bwd_kernel(n_leaves, leaf_shapes, batch, dim, res_dims),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=outs_shape,
            scratch_shapes=scratch,
            input_output_aliases=aliases,
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(*ins)
        k = 0
        ct_y0 = res_b[k]; k += 1
        ct_f0 = res_b[k]; k += 1
        ct_ys0 = ()
        if n_save:
            ct_ys0 = res_b[k].astype(ys0.dtype); k += 1
        ct_leaves = [a.astype(l.dtype)
                     for a, l in zip(res_b[k:k + n_leaves], leaves)]
        k += n_leaves
        ct_t0 = res_b[k][0, 0]; k += 1
        ct_t1 = res_b[k][0, 0]; k += 1
        ct_dt0 = res_b[k][0, 0]
        # saveat gets a zero cotangent: every solve engine treats the save
        # grid as non-differentiable (the reference jitters it as data).
        ct_sa = jnp.zeros_like(saveat) if n_save else ()
        return (ct_t0, ct_t1, ct_dt0, ct_y0.astype(y0.dtype),
                ct_f0.astype(f0.dtype), ct_ys0, ct_sa, ct_leaves)

    solve.defvjp(solve_fwd, solve_bwd)
    return solve


# ---------------------------------------------------------------------------
# odeint-compatible front end
# ---------------------------------------------------------------------------


def whole_solve_odeint(
    func: Callable,
    apply_fn: Callable,
    flatten: Callable,
    y0: jnp.ndarray,
    t0,
    t1,
    args,
    *,
    rtol: float,
    atol: float,
    max_steps: int,
    saveat: Optional[jnp.ndarray] = None,
    controller: Optional[PIController] = None,
    dt0: Optional[float] = None,
    matmul_precision: Optional[str] = "highest",
    algebra_bwd: Optional[Callable] = None,
    algebra_fwd_res: Optional[Callable] = None,
) -> ODESolution:
    """Run a whole-solve fused integration with odeint's exact prologue
    (Hairer initial-dt heuristic, NFE accounting, saveat seeding) and
    return an identical ``ODESolution``.

    ``func(t, y, args)`` is the model-level dynamics (used for the f0 /
    initial-dt evaluations so accounting matches odeint bit-for-bit);
    ``apply_fn`` + ``flatten(args) -> leaves`` give the in-kernel form.
    The flatten runs OUTSIDE the kernel's custom_vjp, so parameter
    cotangents transpose through it automatically — no unflatten adapter.
    """
    if matmul_precision is not None:
        with jax.default_matmul_precision(matmul_precision):
            return whole_solve_odeint(
                func, apply_fn, flatten, y0, t0, t1, args,
                rtol=rtol, atol=atol, max_steps=max_steps, saveat=saveat,
                controller=controller, dt0=dt0, matmul_precision=None,
                algebra_bwd=algebra_bwd, algebra_fwd_res=algebra_fwd_res,
            )
    t0 = jnp.asarray(t0, f32)
    t1 = jnp.asarray(t1, f32)
    tdir = jnp.sign(t1 - t0)

    f_init = func(t0, y0, args)
    nfe_init = 1
    if dt0 is None:
        dt_init, _ = initial_step_size(
            func, t0, y0, f_init, args, TSIT5.order, rtol, atol, t1)
        nfe_init = 2
    else:
        dt_init = jnp.asarray(dt0, f32) * tdir

    # Sublane alignment: Mosaic faults the TPU WORKER (not a Python
    # error) on (batch, pad128(dim)) VMEM refs whose batch is not a
    # multiple of 8 — measured round 4 on a (100, 2) SDE solve (the
    # reference's own sde_toy uses 100 trajectories,
    # experiments/sde_toy_problem.jl:61-76). Pad with copies of the last
    # row and mask them out of the norm sums (n_real) so controller
    # decisions — hence NFE and gradients — match the unpadded solve;
    # the f0 / initial-dt prologue above already ran on the real rows.
    # Applied on every backend so CPU CI exercises the same masked path.
    n_real = None
    batch_real = y0.shape[0]
    if batch_real % 8:
        n_real = batch_real
        npad = 8 - batch_real % 8
        pad = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (npad,) + a.shape[1:])], axis=0)
        y0 = pad(y0)
        f_init = pad(f_init)
        algebra_bwd = algebra_fwd_res = None

    n_save = 0
    ys0 = ()
    sa = ()
    if saveat is not None:
        # The cursor-based save kernel takes the sorted grid as-is — no
        # chunk padding needed.
        sa = jnp.asarray(saveat, f32)
        n_save = int(sa.shape[0])
        at_start = (sa - t0) * tdir <= 0
        ys0 = jnp.where(
            at_start.reshape((-1, 1, 1)), y0[None],
            jnp.zeros((n_save,) + y0.shape, y0.dtype))

    solve = make_whole_solve(
        apply_fn, rtol, atol, controller=controller, max_steps=max_steps,
        n_save=n_save, algebra_bwd=algebra_bwd,
        algebra_fwd_res=algebra_fwd_res, n_real=n_real,
        # No-replay backward (round 5): stream stage residuals from the
        # forward kernel whenever the hand pullback is available.
        cache_residuals=(algebra_bwd is not None
                         and algebra_fwd_res is not None),
    )
    leaves = flatten(args)
    (y1, ys, tel, _tf, _dtf, _qoldf, na, nr, done) = solve(
        t0, t1, dt_init.astype(f32), y0, f_init, ys0, sa, list(leaves))
    if n_real is not None:
        y1 = y1[:batch_real]
        if n_save:
            ys = ys[:, :batch_real]
    nsteps = na + nr
    stats = ODEStats(
        nfe=jnp.asarray(nfe_init, i32) + (TSIT5.num_stages - 1) * nsteps,
        naccept=na, nreject=nr, success=done,
    )
    return ODESolution(
        y1=y1,
        ys=ys if saveat is not None else None,
        ts=saveat,
        stats=stats,
        telemetry=tel,
    )


# ---------------------------------------------------------------------------
# Tiled whole-solve (no saveat): batch larger than one VMEM working set.
#
# The monolithic kernels above keep the full batch's stage stacks live,
# which caps them at ~small-dim models. This variant keeps the CARRY state
# (y, f0 and their cotangents) in VMEM scratch REFS and sweeps the Tsit5
# stages per batch TILE in a ROLLED fori loop (rolled so Mosaic reuses one
# tile's stage buffers across iterations; values can't be dynamically
# sliced, refs can). The per-step norm scalars accumulate across tiles
# exactly like the step-level NormedSweep path, so step control stays
# whole-batch-global. Built for the MNIST flagship (784-wide, batch 512).
#
# The backward walks history in reverse: the controller/telemetry scalar
# chain replays from the STORED per-step norm sums (he/hn/hd) via
# jax.vjp of the same `post` math, and each tile runs one vjp of the
# stage algebra seeded with (ct_y_new, ct_k7, ct_e, ct_n, ct_d) — the
# in-kernel equivalent of ops.ode._make_fast_adjoint_solve's backward.
# ---------------------------------------------------------------------------


def make_whole_solve_tiled(
    apply_fn: Callable,
    rtol: float,
    atol: float,
    *,
    controller: Optional[PIController] = None,
    max_steps: int,
    tile_rows: int = 64,
    interpret: Optional[bool] = None,
):
    """Build ``solve(t0, t1, dt0, y0, f0, leaves)`` (final-state only)
    with batch-tiled one-kernel forward/backward."""
    ctrl = controller or PIController.for_order(TSIT5.order)
    algebra = _stage_algebra(apply_fn, rtol, atol)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def post(t, dt, qold, e, n, d, t1, span, tdir, count):
        """Scalar chain from the accumulated norm sums — the shared unit
        whose vjp drives the backward's controller pullback."""
        remaining = t1 - t
        is_last = (dt - remaining) * tdir >= 0
        dt_eff = jnp.where(is_last, remaining, dt)
        eest, eigen = _normed_scalars(e, n, d, count, f32)
        accept = eest <= 1.0
        dt_next, qold_next = ctrl.propose(
            jnp.reshape(dt_eff, (1, 1)), jnp.reshape(eest, (1, 1)),
            jnp.reshape(qold, (1, 1)), jnp.reshape(accept, (1, 1)))
        dt_next = dt_next[0, 0]
        qold_next = qold_next[0, 0]
        dt_next = jnp.sign(dt_next) * jnp.minimum(jnp.abs(dt_next), span)
        t_new = jnp.where(accept, jnp.where(is_last, t1, t + dt_eff), t)
        tel_t = jnp.where(is_last, t1, t + dt_eff)
        acc_f = accept.astype(f32)
        done_f = (accept & is_last).astype(f32)
        return (t_new, dt_next, qold_next, tel_t, dt_eff, eest, eigen,
                acc_f, done_f)

    def make_fwd_kernel(n_leaves, batch, dim):
        ntiles = batch // tile_rows
        T = tile_rows

        def kernel(*refs):
            k = 0
            t0r = refs[k]; k += 1
            t1r = refs[k]; k += 1
            dt0r = refs[k]; k += 1
            y0r = refs[k]; k += 1
            f0r = refs[k]; k += 1
            leaf_refs = refs[k:k + n_leaves]; k += n_leaves
            y1r = refs[k]; k += 1
            telt = refs[k]; k += 1
            teldt = refs[k]; k += 1
            tele = refs[k]; k += 1
            telg = refs[k]; k += 1
            telacc = refs[k]; k += 1
            ht = refs[k]; k += 1
            hdt = refs[k]; k += 1
            hqold = refs[k]; k += 1
            he = refs[k]; k += 1
            hn = refs[k]; k += 1
            hd = refs[k]; k += 1
            tfr = refs[k]; k += 1
            dtfr = refs[k]; k += 1
            qoldfr = refs[k]; k += 1
            nar = refs[k]; k += 1
            nrr = refs[k]; k += 1
            doner = refs[k]; k += 1
            hyr = refs[k]; k += 1
            hfr = refs[k]; k += 1
            yref = refs[k]; k += 1   # scratch: current y (B, dpad)
            fref = refs[k]; k += 1   # scratch: current f0
            ynref = refs[k]; k += 1  # scratch: trial y_new
            knref = refs[k]; k += 1  # scratch: trial k7
            sem = refs[k]; k += 1

            t0 = t0r[0, 0]
            t1 = t1r[0, 0]
            dt0 = dt0r[0, 0]
            tdir = jnp.sign(t1 - t0)
            span = jnp.abs(t1 - t0)
            leaves = [r[:] for r in leaf_refs]
            count = jnp.asarray(float(batch * dim), f32)

            yref[:, :dim] = y0r[:]
            fref[:, :dim] = f0r[:]

            # No in-kernel stream zeroing (see the monolithic kernel's
            # note); the wrapper masks rows >= na+nr.

            def cond(c):
                i, t, dt, qold, na, nr, done = c
                return (done == 0) & (i < max_steps)

            def body(c):
                i, t, dt, qold, na, nr, done = c
                ht[i] = t
                hdt[i] = dt
                hqold[i] = qold
                d1 = pltpu.make_async_copy(yref, hyr.at[i], sem.at[0])
                d2 = pltpu.make_async_copy(fref, hfr.at[i], sem.at[1])
                d1.start()
                d2.start()

                remaining = t1 - t
                is_last = (dt - remaining) * tdir >= 0
                dt_eff = jnp.where(is_last, remaining, dt)

                def tile_body(ti, acc):
                    e_a, n_a, d_a = acc
                    sl = pl.ds(ti * T, T)
                    y_t = yref[sl, :dim]
                    f_t = fref[sl, :dim]
                    yn_t, k7_t, e_t, n_t, d_t = algebra(
                        t, dt_eff, y_t, f_t, leaves)
                    ynref[sl, :dim] = yn_t
                    knref[sl, :dim] = k7_t
                    return (e_a + e_t, n_a + n_t, d_a + d_t)

                e, n, d = lax.fori_loop(
                    0, ntiles, tile_body,
                    (jnp.zeros((), f32),) * 3)

                (t_new, dt_next, qold_next, tel_t, dt_eff2, eest, eigen,
                 acc_f, done_f) = post(t, dt, qold, e, n, d, t1, span,
                                       tdir, count)
                he[i] = e
                hn[i] = n
                hd[i] = d
                telt[i] = tel_t
                teldt[i] = dt_eff2
                tele[i] = eest
                telg[i] = eigen
                telacc[i] = acc_f
                d1.wait()
                d2.wait()

                @pl.when(acc_f > 0.5)
                def _():
                    yref[:] = ynref[:]
                    fref[:] = knref[:]

                acc_i = acc_f.astype(i32)
                return (i + 1, t_new.astype(f32), dt_next.astype(f32),
                        qold_next.astype(f32), na + acc_i, nr + 1 - acc_i,
                        (done_f > 0).astype(i32))

            done0 = (span == 0.0).astype(i32)
            init = (jnp.asarray(0, i32), t0, dt0,
                    jnp.asarray(ctrl.qoldinit, f32), jnp.asarray(0, i32),
                    jnp.asarray(0, i32), done0)
            (_, t, dt, qold, na, nr, done) = lax.while_loop(cond, body, init)
            y1r[:] = yref[:, :dim]
            tfr[0, 0] = t
            dtfr[0, 0] = dt
            qoldfr[0, 0] = qold
            nar[0, 0] = na
            nrr[0, 0] = nr
            doner[0, 0] = done

        return kernel

    def make_bwd_kernel(n_leaves, leaf_shapes, batch, dim):
        ntiles = batch // tile_rows
        T = tile_rows

        def kernel(*refs):
            k = 0
            t0r = refs[k]; k += 1
            t1r = refs[k]; k += 1
            nsr = refs[k]; k += 1
            cttfr = refs[k]; k += 1
            ctdtfr = refs[k]; k += 1
            ctqoldfr = refs[k]; k += 1
            ht = refs[k]; k += 1
            hdt = refs[k]; k += 1
            hqold = refs[k]; k += 1
            he = refs[k]; k += 1
            hn = refs[k]; k += 1
            hd = refs[k]; k += 1
            cttelt = refs[k]; k += 1
            ctteldt = refs[k]; k += 1
            cttele = refs[k]; k += 1
            cttelg = refs[k]; k += 1
            cty1r = refs[k]; k += 1
            leaf_refs = refs[k:k + n_leaves]; k += n_leaves
            hyr = refs[k]; k += 1
            hfr = refs[k]; k += 1
            cty0r = refs[k]; k += 1
            ctf0r = refs[k]; k += 1
            ctleaf_refs = refs[k:k + n_leaves]; k += n_leaves
            ctt0r = refs[k]; k += 1
            ctt1r = refs[k]; k += 1
            ctdt0r = refs[k]; k += 1
            ldy = refs[k]; k += 1    # scratch: y_i (B, dpad)
            ldf = refs[k]; k += 1    # scratch: f0_i
            ctyref = refs[k]; k += 1  # scratch: running ct_y
            ctfref = refs[k]; k += 1  # scratch: running ct_f0
            sem = refs[k]; k += 1

            t0 = t0r[0, 0]
            t1 = t1r[0, 0]
            ns = nsr[0, 0]
            tdir = jnp.sign(t1 - t0)
            span = jnp.abs(t1 - t0)
            leaves = [r[:] for r in leaf_refs]
            count = jnp.asarray(float(batch * dim), f32)

            ctyref[:, :dim] = cty1r[:]
            ctfref[:, :dim] = jnp.zeros((batch, dim), f32)

            post_fn = lambda t_, dt_, q_, e_, n_, d_, t1_, sp_: post(
                t_, dt_, q_, e_, n_, d_, t1_, sp_, tdir, count)

            ct_leaves0 = tuple(jnp.zeros(s, f32) for s in leaf_shapes)
            carry0 = (
                cttfr[0, 0], ctdtfr[0, 0], ctqoldfr[0, 0],
                jnp.zeros((), f32), jnp.zeros((), f32),
            ) + ct_leaves0

            def body(j, c):
                ct_t, ct_dt, ct_qold, ct_t1a, ct_spana = c[:5]
                ct_ls = c[5:]
                i = ns - 1 - j
                d1 = pltpu.make_async_copy(hyr.at[i], ldy, sem.at[0])
                d2 = pltpu.make_async_copy(hfr.at[i], ldf, sem.at[1])
                d1.start()
                d2.start()
                t_i = ht[i]
                dt_i = hdt[i]
                qold_i = hqold[i]
                e_i = he[i]
                n_i = hn[i]
                d_i = hd[i]
                d1.wait()
                d2.wait()

                # scalar controller/telemetry chain from stored norm sums
                outs_p, vjp_p = jax.vjp(post_fn, t_i, dt_i, qold_i,
                                        e_i, n_i, d_i, t1, span)
                acc_f = outs_p[7]
                acc_b = acc_f > 0.5
                (dp_t, dp_dt, dp_qold, ct_e, ct_n, ct_d, dp_t1,
                 dp_span) = vjp_p((ct_t, ct_dt, ct_qold, cttelt[i],
                                   ctteldt[i], cttele[i], cttelg[i],
                                   jnp.zeros((), f32), jnp.zeros((), f32)))

                remaining = t1 - t_i
                is_last = (dt_i - remaining) * tdir >= 0
                dt_eff = jnp.where(is_last, remaining, dt_i)

                def tile_body(ti, acc):
                    (a_t, a_dteff, *a_ls) = acc
                    sl = pl.ds(ti * T, T)
                    y_t = ldy[sl, :dim]
                    f_t = ldf[sl, :dim]
                    ct_y_t = ctyref[sl, :dim]
                    ct_f_t = ctfref[sl, :dim]
                    # route carry cts by accept: y_out = where(acc, y_new, y)
                    z = jnp.zeros((T, dim), f32)
                    ct_yn = jnp.where(acc_b, ct_y_t, z)
                    ct_k7 = jnp.where(acc_b, ct_f_t, z)
                    _, vjp_t = jax.vjp(
                        lambda tt, dd, yy, ff, ls: algebra(tt, dd, yy, ff,
                                                           ls),
                        t_i, dt_eff, y_t, f_t, list(leaves))
                    (h_t, h_dteff, d_y, d_k1, d_ls) = vjp_t(
                        (ct_yn, ct_k7, ct_e, ct_n, ct_d))
                    ctyref[sl, :dim] = jnp.where(acc_b, z, ct_y_t) + d_y
                    ctfref[sl, :dim] = jnp.where(acc_b, z, ct_f_t) + d_k1
                    return (a_t + h_t, a_dteff + h_dteff,
                            *[a + b for a, b in zip(a_ls, d_ls)])

                tile0 = (jnp.zeros((), f32), jnp.zeros((), f32)) + tuple(
                    jnp.zeros(s, f32) for s in leaf_shapes)
                tres = lax.fori_loop(0, ntiles, tile_body, tile0)
                k_ct_t, k_ct_dteff = tres[0], tres[1]
                d_leaves = tres[2:]

                # dt_eff = where(is_last, t1 - t, dt): the kernel-side
                # dt_eff cotangent routes into (t, dt, t1); the scalar
                # chain's own dt_eff handling is inside post's vjp already.
                d_t_pre = jnp.where(is_last, -k_ct_dteff, 0.0)
                d_dt_pre = jnp.where(is_last, 0.0, k_ct_dteff)
                d_t1_pre = jnp.where(is_last, k_ct_dteff, 0.0)

                return (
                    (dp_t + k_ct_t + d_t_pre).astype(f32),
                    (dp_dt + d_dt_pre).astype(f32),
                    dp_qold,
                    ct_t1a + dp_t1 + d_t1_pre,
                    ct_spana + dp_span,
                ) + tuple(a + b for a, b in zip(ct_ls, d_leaves))

            out = lax.fori_loop(0, ns, body, carry0)
            ct_t, ct_dt, _ct_qold, ct_t1a, ct_spana = out[:5]
            ct_ls = out[5:]
            cty0r[:] = ctyref[:, :dim]
            ctf0r[:] = ctfref[:, :dim]
            for r, v in zip(ctleaf_refs, ct_ls):
                r[:] = v
            ctt0r[0, 0] = ct_t - tdir * ct_spana
            ctt1r[0, 0] = ct_t1a + tdir * ct_spana
            ctdt0r[0, 0] = ct_dt

        return kernel

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)

    def _s(x):
        return jnp.reshape(jnp.asarray(x, f32), (1, 1))

    def _forward(t0, t1, dt0, y0, f0, leaves):
        batch, dim = y0.shape
        if batch % tile_rows:
            raise ValueError(
                f"tiled whole-solve needs batch % {tile_rows} == 0")
        dpad = _pad128(dim)
        n_leaves = len(leaves)
        ins = [_s(t0), _s(t1), _s(dt0), y0, f0] + list(leaves)
        in_specs = [smem] * 3 + [vmem, vmem] + [vmem] * n_leaves
        outs_shape = ([jax.ShapeDtypeStruct((batch, dim), y0.dtype)]
                      + [jax.ShapeDtypeStruct((max_steps,), f32)] * 11
                      + [jax.ShapeDtypeStruct((1, 1), f32)] * 3
                      + [jax.ShapeDtypeStruct((1, 1), i32)] * 3
                      + [jax.ShapeDtypeStruct((max_steps, batch, dpad),
                                              f32)] * 2)
        out_specs = ([vmem] + [smem] * 11 + [smem] * 6 + [anym, anym])
        res = pl.pallas_call(
            make_fwd_kernel(n_leaves, batch, dim),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=outs_shape,
            scratch_shapes=[
                pltpu.VMEM((batch, dpad), f32),
                pltpu.VMEM((batch, dpad), f32),
                pltpu.VMEM((batch, dpad), f32),
                pltpu.VMEM((batch, dpad), f32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(*ins)
        k = 0
        y1 = res[k]; k += 1
        (telt, teldt, tele, telg, telacc,
         ht, hdt, hqold, he, hn, hd) = res[k:k + 11]; k += 11
        tf, dtf, qoldf, na, nr, done = res[k:k + 6]; k += 6
        hy, hf = res[k:k + 2]
        live = jnp.arange(max_steps, dtype=i32) < (na[0, 0] + nr[0, 0])
        zf = jnp.zeros((), f32)
        tel = StepTelemetry(
            t=jnp.where(live, telt, zf),
            dt=jnp.where(live, teldt, zf),
            eest=jnp.where(live, tele, zf),
            eigen_est=jnp.where(live, telg, zf),
            accepted=jnp.where(live, telacc, zf) > 0.5,
            live=live,
        )
        outs = (y1, tel, tf[0, 0], dtf[0, 0], qoldf[0, 0],
                na[0, 0], nr[0, 0], done[0, 0] > 0)
        resid = (ht, hdt, hqold, he, hn, hd, hy, hf, na[0, 0] + nr[0, 0])
        return outs, resid

    @jax.custom_vjp
    def solve(t0, t1, dt0, y0, f0, leaves):
        outs, _ = _forward(t0, t1, dt0, y0, f0, leaves)
        return outs

    def solve_fwd(t0, t1, dt0, y0, f0, leaves):
        outs, resid = _forward(t0, t1, dt0, y0, f0, leaves)
        return outs, (resid, t0, t1, y0, f0, leaves)

    def _mat(ct, like):
        if ct is None or (hasattr(ct, "dtype")
                          and ct.dtype == jax.dtypes.float0):
            return jnp.zeros(jnp.shape(like), jnp.result_type(like, f32))
        return ct

    def solve_bwd(res, cts):
        # Same backward-trace precision guard as the saveat variant
        # above (custom_vjp backwards trace outside the forward's
        # context); no-op today, load-bearing if an ambient-precision
        # dot ever enters this reverse chain.
        with jax.default_matmul_precision("highest"):
            return _solve_bwd_impl(res, cts)

    def _solve_bwd_impl(res, cts):
        (resid, t0, t1, y0, f0, leaves) = res
        ht, hdt, hqold, he, hn, hd, hy, hf, nsteps = resid
        (ct_y1, ct_tel, ct_tf, ct_dtf, ct_qoldf, _na, _nr, _done) = cts
        batch, dim = y0.shape
        dpad = _pad128(dim)
        n_leaves = len(leaves)
        zs = jnp.zeros((max_steps,), f32)
        ins = [
            _s(t0), _s(t1),
            jnp.reshape(jnp.asarray(nsteps, i32), (1, 1)),
            _s(_mat(ct_tf, 0.0)), _s(_mat(ct_dtf, 0.0)),
            _s(_mat(ct_qoldf, 0.0)),
            ht, hdt, hqold, he, hn, hd,
            _mat(ct_tel.t, zs), _mat(ct_tel.dt, zs),
            _mat(ct_tel.eest, zs), _mat(ct_tel.eigen_est, zs),
            _mat(ct_y1, y0),
        ] + list(leaves) + [hy, hf]
        in_specs = ([smem] * 6 + [smem] * 10 + [vmem]
                    + [vmem] * n_leaves + [anym, anym])
        leaf_shapes = tuple(tuple(l.shape) for l in leaves)
        outs_shape = ([jax.ShapeDtypeStruct((batch, dim), f32)] * 2
                      + [jax.ShapeDtypeStruct(s, f32) for s in leaf_shapes]
                      + [jax.ShapeDtypeStruct((1, 1), f32)] * 3)
        out_specs = [vmem] * 2 + [vmem] * n_leaves + [smem] * 3
        res_b = pl.pallas_call(
            make_bwd_kernel(n_leaves, leaf_shapes, batch, dim),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=outs_shape,
            scratch_shapes=[
                pltpu.VMEM((batch, dpad), f32),
                pltpu.VMEM((batch, dpad), f32),
                pltpu.VMEM((batch, dpad), f32),
                pltpu.VMEM((batch, dpad), f32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(*ins)
        k = 0
        ct_y0 = res_b[k]; k += 1
        ct_f0 = res_b[k]; k += 1
        ct_leaves = [a.astype(l.dtype)
                     for a, l in zip(res_b[k:k + n_leaves], leaves)]
        k += n_leaves
        ct_t0 = res_b[k][0, 0]; k += 1
        ct_t1 = res_b[k][0, 0]; k += 1
        ct_dt0 = res_b[k][0, 0]
        return (ct_t0, ct_t1, ct_dt0, ct_y0.astype(y0.dtype),
                ct_f0.astype(f0.dtype), ct_leaves)

    solve.defvjp(solve_fwd, solve_bwd)
    return solve


def whole_solve_odeint_tiled(
    func: Callable,
    apply_fn: Callable,
    flatten: Callable,
    y0: jnp.ndarray,
    t0,
    t1,
    args,
    *,
    rtol: float,
    atol: float,
    max_steps: int,
    tile_rows: int = 64,
    controller: Optional[PIController] = None,
    dt0: Optional[float] = None,
    matmul_precision: Optional[str] = "highest",
) -> ODESolution:
    """Tiled whole-solve with odeint's exact prologue (final-state only)."""
    if matmul_precision is not None:
        with jax.default_matmul_precision(matmul_precision):
            return whole_solve_odeint_tiled(
                func, apply_fn, flatten, y0, t0, t1, args,
                rtol=rtol, atol=atol, max_steps=max_steps,
                tile_rows=tile_rows, controller=controller, dt0=dt0,
                matmul_precision=None,
            )
    if y0.shape[0] % tile_rows:
        raise ValueError(
            f"whole_solve_odeint_tiled needs batch % tile_rows == 0, got "
            f"batch {y0.shape[0]} with tile_rows {tile_rows}")
    t0 = jnp.asarray(t0, f32)
    t1 = jnp.asarray(t1, f32)
    tdir = jnp.sign(t1 - t0)
    f_init = func(t0, y0, args)
    nfe_init = 1
    if dt0 is None:
        dt_init, _ = initial_step_size(
            func, t0, y0, f_init, args, TSIT5.order, rtol, atol, t1)
        nfe_init = 2
    else:
        dt_init = jnp.asarray(dt0, f32) * tdir
    solve = make_whole_solve_tiled(
        apply_fn, rtol, atol, controller=controller, max_steps=max_steps,
        tile_rows=tile_rows,
    )
    leaves = flatten(args)
    (y1, tel, _tf, _dtf, _qoldf, na, nr, done) = solve(
        t0, t1, dt_init.astype(f32), y0, f_init, list(leaves))
    nsteps = na + nr
    stats = ODEStats(
        nfe=jnp.asarray(nfe_init, i32) + (TSIT5.num_stages - 1) * nsteps,
        naccept=na, nreject=nr, success=done,
    )
    return ODESolution(y1=y1, ys=None, ts=None, stats=stats, telemetry=tel)
