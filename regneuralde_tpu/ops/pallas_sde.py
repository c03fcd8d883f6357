"""Whole-solve fused SRI kernels: the adaptive SDE loop as ONE Pallas launch.

The SDE counterpart of ``ops.pallas_solve``. ``ops.sde.sdeint`` executes
one XLA while-loop iteration per trial step — kernel launches, Brownian
bridge algebra, controller glue — which dominates wall clock for the
reference's SDE family (32-wide drift/diffusion nets, ~5-10 trial steps
per solve at rtol=1.4e-1; reference: src/models/neural_sde.jl:84-114,
experiments/mnist_nsde.jl:45-87). This module moves the ENTIRE adaptive
SRI solve inside a single kernel per direction:

* **Brownian path**: the per-trial-step N(0,1) draws are PRE-SAMPLED
  outside the kernel with ``sdeint``'s exact key chain (the chain is
  data-independent: one ``jax.random.split`` per trial step regardless of
  accept/reject), stored as ``(max_steps, batch, dim)`` HBM buffers and
  DMA'd in row-by-row. The kernel reproduces scan-mode solves draw-for-
  draw; the rejection-safe bridge (tail commit/conditional resample,
  ops.sde._sample_increment) runs in-kernel on VMEM values.
* forward: in-kernel ``lax.while_loop`` carrying (t, dt, qold, y,
  tail_h, tail_w, tail_z); per-step history (y and the Brownian tail)
  DMA'd to HBM; telemetry/controller scalars in SMEM streams; ``saveat``
  rows linearly interpolated (matching ``ops.sde``'s scan semantics) via
  the same monotone save cursor as ``ops.pallas_solve`` — one scalar
  compare per step, row writes fire exactly ``n_save`` times per solve.
* backward: one kernel walks the history in reverse, seeding ``jax.vjp``
  of the SAME in-kernel ``trial_step`` with the running cotangents —
  gradients flow through the bridge's dt-dependent scale, the embedded
  error, and the PI controller exactly as in scan/adjoint modes. The
  noise draws are non-differentiable inputs (as the RNG key is in
  ``ops.sde._sde_adjoint_solve``).

Dynamics stay GENERIC: parameters enter as the flattened leaves of the
caller's args pytree (reshaped 2-D for VMEM) and are rebuilt inside the
kernel, so any drift/diffusion whose ops lower in Mosaic (Dense chains,
elementwise nonlinearities) is supported without a hand-written kernel
form. Scope: single-leaf 2-D f32 state, whole batch VMEM-resident —
which covers the reference's entire SDE family.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from regneuralde_tpu.ops.controller import PIController
from regneuralde_tpu.ops.norms import error_ratio, hairer_norm
from regneuralde_tpu.ops.ode import StepTelemetry
from regneuralde_tpu.ops.sde import SDESolution, SDEStats
from regneuralde_tpu.ops.sri import (
    diffusion_evals_per_step,
    drift_evals_per_step,
    get_tableau,
    sri_step,
)

f32 = jnp.float32
i32 = jnp.int32


def _pad128(d: int) -> int:
    return ((d + 127) // 128) * 128


def vmem_estimate_sde(batch: int, dim: int, n_save: int = 0,
                      leaves_bytes: int = 0) -> int:
    """Rough peak-VMEM bound for the backward kernel: the traced vjp of a
    4-stage SRI trial step keeps ~40 batch-size arrays live (drift and
    diffusion stages, their states, the Ito-integral coefficient arrays,
    and all their cotangents), plus DMA staging and the save buffer."""
    row = batch * _pad128(dim) * 4
    return 48 * row + n_save * row + 3 * leaves_bytes


def presample_noise(key: jax.Array, shape, dtype, max_steps: int):
    """The (xi_w, xi_z) N(0,1) draws ``ops.sde.sdeint`` would make, one
    pair per trial step, reproducing its exact key chain
    (``split(carry.key)`` -> ``split(sub)`` -> ``_normal_like``'s
    per-leaf split). Shape ``(max_steps,) + shape`` each.

    Only the (scalar-cheap) key chain is sequential; the actual sampling
    is one vmapped batch — a sequential scan of per-step ``normal``
    calls costs ~0.3ms of pure loop overhead at max_steps=64, paid even
    when the solve accepts after a handful of steps."""

    def chain(k, _):
        k_next, sub = jax.random.split(k)
        return k_next, sub

    _, subs = lax.scan(chain, key, None, length=max_steps)

    def draw(sub):
        kw, kz = jax.random.split(sub)
        xw = jax.random.normal(jax.random.split(kw, 1)[0], shape, dtype)
        xz = jax.random.normal(jax.random.split(kz, 1)[0], shape, dtype)
        return xw, xz

    return jax.vmap(draw)(subs)


def make_sde_whole_solve(
    drift_fn: Callable,
    diffusion_fn: Callable,
    solver: str,
    rtol: float,
    atol: float,
    *,
    controller: Optional[PIController] = None,
    max_steps: int,
    n_save: int = 0,
    interpret: Optional[bool] = None,
    n_real: Optional[int] = None,
):
    """Build ``solve(t0, t1, dt0, y0, ys0, saveat, xi_w, xi_z, leaves)``
    with a one-kernel forward and a one-kernel custom-vjp backward.

    ``drift_fn(t, y, leaves)`` / ``diffusion_fn(t, y, leaves)`` evaluate
    the dynamics over the flat 2-D leaf list. ``xi_w``/``xi_z`` are the
    presampled draws (``presample_noise``), padded to ``(max_steps,
    batch, pad128(dim))``. Returns ``(y1, ys, tel, t_f, dt_f, qold_f,
    naccept, nreject, done)``.

    ``n_real`` (static): number of real batch rows when the caller padded
    to the 8-row sublane alignment — EEst and eigen_est mask out the pad
    rows so step control matches the unpadded solve bit-for-bit up to
    reduction order.
    """
    tab = get_tableau(solver)
    ctrl = controller or PIController(beta1=0.5, beta2=0.0)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def _row_mask(a):
        """Zero the pad rows of a (batch, dim) block (no-op when the
        batch is unpadded)."""
        if n_real is None or n_real >= a.shape[0]:
            return a
        m = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) < n_real
        return jnp.where(m, a, 0.0)

    def _masked_rms(a):
        """hairer_norm over the real rows only (same zero-point guard)."""
        a = _row_mask(a)
        cnt = float((n_real if n_real is not None
                     and n_real < a.shape[0] else a.shape[0]) * a.shape[1])
        ssq = jnp.sum(a * a)
        safe = jnp.where(ssq > 0, ssq, 1.0)
        return jnp.where(ssq > 0, jnp.sqrt(safe / cnt), 0.0)

    def trial_step(t, dt, qold, y, tail_h, tail_w, tail_z, xi_w, xi_z,
                   t1, span, leaves):
        """One SRI trial step as a pure function of loaded values —
        shared by both kernels (the backward jax.vjp's it). Mirrors
        ops.sde.sdeint's make_step + _sample_increment op-for-op
        (forward time only: tdir = +1)."""
        remaining = t1 - t
        is_last = dt >= remaining
        dt_eff = jnp.where(is_last, remaining, dt)

        # Brownian bridge conditioned on the committed tail.
        h = tail_h
        safe_h = jnp.maximum(h, 1e-30)
        inside = dt_eff < h
        frac = jnp.where(inside, dt_eff / safe_h, 1.0)
        var = jnp.where(inside, dt_eff * (h - dt_eff) / safe_h,
                        jnp.maximum(dt_eff - h, 0.0))
        # Zero-guarded sqrt, matching ops.sde._sample_increment: var hits
        # exactly 0 when the step consumes the tail exactly, and
        # sqrt'(0) = inf would poison the traced-vjp backward.
        var = jnp.maximum(var, 0.0)
        std = jnp.where(var > 0, jnp.sqrt(jnp.where(var > 0, var, 1.0)),
                        0.0)
        dw = frac * tail_w + std * xi_w
        dz = frac * tail_z + std * xi_z
        rem_w = jnp.where(inside, tail_w - dw, jnp.zeros_like(dw))
        rem_z = jnp.where(inside, tail_z - dz, jnp.zeros_like(dz))
        tail_h_acc = jnp.where(inside, h - dt_eff, 0.0)

        drift = lambda tt, yy, _: drift_fn(tt, yy, leaves)
        diffusion = lambda tt, yy, _: diffusion_fn(tt, yy, leaves)
        y_new, err, stage_info = sri_step(
            tab, drift, diffusion, None, t, y, dt_eff, dw, dz)
        if n_real is None:
            eest = error_ratio(err, y, y_new, rtol, atol)
        else:
            eest = _masked_rms(
                err / (atol + jnp.maximum(jnp.abs(y), jnp.abs(y_new))
                       * rtol))
        accept = eest <= 1.0

        f_a, f_b, h_a, h_b = stage_info
        num = _masked_rms(f_b - f_a)
        den = _masked_rms(h_b - h_a)
        eigen_est = jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0)

        # Controller on (1,1) vectors: Mosaic has no scalar powf.
        dt_next, qold_next = ctrl.propose(
            jnp.reshape(dt_eff, (1, 1)), jnp.reshape(eest, (1, 1)),
            jnp.reshape(qold, (1, 1)), jnp.reshape(accept, (1, 1)))
        dt_next = jnp.minimum(dt_next[0, 0], span)
        qold_next = qold_next[0, 0]

        t_new = jnp.where(accept, jnp.where(is_last, t1, t + dt_eff), t)
        y_out = jnp.where(accept, y_new, y)
        tail_h_out = jnp.where(accept, tail_h_acc, dt_eff)
        tail_w_out = jnp.where(accept, rem_w, dw)
        tail_z_out = jnp.where(accept, rem_z, dz)
        tel_t = jnp.where(is_last, t1, t + dt_eff)
        acc_f = accept.astype(f32)
        done_f = (accept & is_last).astype(f32)
        return (t_new, dt_next, qold_next, y_out, tail_h_out, tail_w_out,
                tail_z_out, tel_t, dt_eff, eest.astype(f32),
                eigen_est.astype(f32), acc_f, done_f)

    def _lin_row(th, y, y_new):
        """Linear interpolation at scalar fraction ``th`` on one
        (batch, dim) row (matches ops.sde's in-step ``lin``)."""
        return (1 - th) * y + th * y_new

    # ------------------------------------------------------------------
    # forward kernel
    # ------------------------------------------------------------------

    def make_fwd_kernel(n_leaves):
        def kernel(*refs):
            k = 0
            t0r = refs[k]; k += 1
            t1r = refs[k]; k += 1
            dt0r = refs[k]; k += 1
            y0r = refs[k]; k += 1
            if n_save:
                sar = refs[k]; k += 1     # SMEM (n_save,) sorted save times
                cur0r = refs[k]; k += 1   # SMEM (1,1) i32: rows at/before t0
                ys0r = refs[k]; k += 1
            leaf_refs = refs[k:k + n_leaves]; k += n_leaves
            xiwr = refs[k]; k += 1  # HBM (max_steps, batch, dpad)
            xizr = refs[k]; k += 1
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
            hth = refs[k]; k += 1  # tail_h history
            tfr = refs[k]; k += 1
            dtfr = refs[k]; k += 1
            qoldfr = refs[k]; k += 1
            nar = refs[k]; k += 1
            nrr = refs[k]; k += 1
            doner = refs[k]; k += 1
            curfr = refs[k]; k += 1
            hyr = refs[k]; k += 1   # HBM history: y
            hwr = refs[k]; k += 1   # HBM history: tail_w
            hzr = refs[k]; k += 1   # HBM history: tail_z
            cpy = refs[k]; k += 1   # staging scratch
            cpw = refs[k]; k += 1
            cpz = refs[k]; k += 1
            lxw = refs[k]; k += 1   # xi row scratch
            lxz = refs[k]; k += 1
            sem = refs[k]; k += 1

            t0 = t0r[0, 0]
            t1 = t1r[0, 0]
            dt0 = dt0r[0, 0]
            span = t1 - t0
            leaves = [r[:] for r in leaf_refs]
            y0 = y0r[:]
            dim = y0.shape[-1]
            cur0 = cur0r[0, 0] if n_save else jnp.asarray(0, i32)

            # No in-kernel stream zeroing (a fori_loop of max_steps scalar
            # SMEM stores costs ~ms on the scalar core); rows beyond the
            # executed step count are masked by the XLA-side wrapper.
            # Saveat uses the same monotone cursor as ops.pallas_solve:
            # one scalar compare per step, interpolation fires exactly
            # n_save times per solve.

            def cond(c):
                return (c[7] == 0) & (c[0] < max_steps)

            def body(c):
                if n_save:
                    (i, t, dt, qold, th, na, nr, done, cur,
                     y, tw, tz) = c
                else:
                    i, t, dt, qold, th, na, nr, done, y, tw, tz = c
                ht[i] = t
                hdt[i] = dt
                hqold[i] = qold
                hth[i] = th
                cpy[:, :dim] = y
                cpw[:, :dim] = tw
                cpz[:, :dim] = tz
                d1 = pltpu.make_async_copy(cpy, hyr.at[i], sem.at[0])
                d2 = pltpu.make_async_copy(cpw, hwr.at[i], sem.at[1])
                d3 = pltpu.make_async_copy(cpz, hzr.at[i], sem.at[2])
                d4 = pltpu.make_async_copy(xiwr.at[i], lxw, sem.at[3])
                d5 = pltpu.make_async_copy(xizr.at[i], lxz, sem.at[4])
                d1.start(); d2.start(); d3.start(); d4.start(); d5.start()
                d4.wait(); d5.wait()
                xi_w = lxw[:, :dim]
                xi_z = lxz[:, :dim]
                (t_new, dt_next, qold_next, y_out, th_out, tw_out, tz_out,
                 tel_t, dt_eff, eest, eigen, acc_f, done_f) = trial_step(
                    t, dt, qold, y, th, tw, tz, xi_w, xi_z, t1, span,
                    leaves)
                if n_save:
                    # y_out == y_new where accepted; tel_t is the accepted
                    # step's endpoint — the cursor consumes (t, tel_t].
                    def save_cond(cu):
                        sa_c = sar[jnp.minimum(cu, n_save - 1)]
                        return (cu < n_save) & (sa_c - tel_t <= 0.0)

                    def save_body(cu):
                        thf = (sar[cu] - t) / jnp.where(
                            dt_eff == 0.0, 1.0, dt_eff)
                        row = _lin_row(thf, y, y_out)
                        ysr[pl.ds(cu, 1)] = row[None]
                        return cu + 1

                    cur = lax.cond(
                        acc_f > 0.5,
                        lambda cu: lax.while_loop(save_cond, save_body, cu),
                        lambda cu: cu, cur)
                telt[i] = tel_t
                teldt[i] = dt_eff
                tele[i] = eest
                telg[i] = eigen
                telacc[i] = acc_f
                d1.wait(); d2.wait(); d3.wait()
                acc_i = acc_f.astype(i32)
                tail = (cur,) if n_save else ()
                return (i + 1, t_new.astype(f32), dt_next.astype(f32),
                        qold_next.astype(f32), th_out.astype(f32),
                        na + acc_i, nr + 1 - acc_i,
                        (done_f > 0).astype(i32)) + tail + (
                        y_out, tw_out, tz_out)

            done0 = (span == 0.0).astype(i32)
            zeros_b = jnp.zeros_like(y0)
            init = (jnp.asarray(0, i32), t0, dt0,
                    jnp.asarray(ctrl.qoldinit, f32), jnp.asarray(0.0, f32),
                    jnp.asarray(0, i32), jnp.asarray(0, i32), done0)
            init += ((cur0,) if n_save else ()) + (y0, zeros_b, zeros_b)
            fin = lax.while_loop(cond, body, init)
            t, dt, qold, th, na, nr, done = fin[1:8]
            y1r[:] = fin[-3]
            tfr[0, 0] = t
            dtfr[0, 0] = dt
            qoldfr[0, 0] = qold
            nar[0, 0] = na
            nrr[0, 0] = nr
            doner[0, 0] = done
            curfr[0, 0] = fin[8] if n_save else jnp.asarray(0, i32)

        return kernel

    # ------------------------------------------------------------------
    # backward kernel
    # ------------------------------------------------------------------

    def make_bwd_kernel(n_leaves, leaf_shapes, batch, dim):
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
            hth = refs[k]; k += 1
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
            xiwr = refs[k]; k += 1
            xizr = refs[k]; k += 1
            hyr = refs[k]; k += 1
            hwr = refs[k]; k += 1
            hzr = refs[k]; k += 1
            # outputs
            cty0r = refs[k]; k += 1
            if n_save:
                ctys0r = refs[k]; k += 1  # aliased with ctysr_in
            ctleaf_refs = refs[k:k + n_leaves]; k += n_leaves
            ctt0r = refs[k]; k += 1
            ctt1r = refs[k]; k += 1
            ctdt0r = refs[k]; k += 1
            ldy = refs[k]; k += 1
            ldw = refs[k]; k += 1
            ldz = refs[k]; k += 1
            lxw = refs[k]; k += 1
            lxz = refs[k]; k += 1
            sem = refs[k]; k += 1

            t0 = t0r[0, 0]
            t1 = t1r[0, 0]
            ns = nsr[0, 0]
            span = t1 - t0
            leaves = [r[:] for r in leaf_refs]
            cur0v = cur0r[0, 0] if n_save else jnp.asarray(0, i32)
            rcur0 = curfr[0, 0] if n_save else jnp.asarray(0, i32)

            step_fn = lambda t_, dt_, q_, y_, th_, tw_, tz_, xw_, xz_, \
                t1_, sp_, ls_: trial_step(t_, dt_, q_, y_, th_, tw_, tz_,
                                          xw_, xz_, t1_, sp_, ls_)

            ct_leaves0 = tuple(jnp.zeros(s, f32) for s in leaf_shapes)
            zeros_b = jnp.zeros((batch, dim), f32)
            carry0 = (
                cttfr[0, 0], ctdtfr[0, 0], ctqoldfr[0, 0],
                cty1r[:], jnp.zeros((), f32), zeros_b, zeros_b,
                jnp.zeros((), f32), jnp.zeros((), f32),
                rcur0,
            ) + ct_leaves0

            def body(j, c):
                (ct_t, ct_dt, ct_qold, ct_y, ct_th, ct_tw, ct_tz,
                 ct_t1a, ct_spana, rcur) = c[:10]
                ct_ls = c[10:]
                i = ns - 1 - j
                d1 = pltpu.make_async_copy(hyr.at[i], ldy, sem.at[0])
                d2 = pltpu.make_async_copy(hwr.at[i], ldw, sem.at[1])
                d3 = pltpu.make_async_copy(hzr.at[i], ldz, sem.at[2])
                d4 = pltpu.make_async_copy(xiwr.at[i], lxw, sem.at[3])
                d5 = pltpu.make_async_copy(xizr.at[i], lxz, sem.at[4])
                d1.start(); d2.start(); d3.start(); d4.start(); d5.start()
                t_i = ht[i]
                dt_i = hdt[i]
                qold_i = hqold[i]
                th_i = hth[i]
                d1.wait(); d2.wait(); d3.wait(); d4.wait(); d5.wait()
                y_i = ldy[:, :dim]
                tw_i = ldw[:, :dim]
                tz_i = ldz[:, :dim]
                xw_i = lxw[:, :dim]
                xz_i = lxz[:, :dim]

                outs, vjp = jax.vjp(step_fn, t_i, dt_i, qold_i, y_i, th_i,
                                    tw_i, tz_i, xw_i, xz_i, t1, span,
                                    list(leaves))
                (_tn, _dtn, _qn, y_out, _tho, _two, _tzo, _telt, dt_eff,
                 _e, _g, acc_f, _df) = outs

                di_t = jnp.zeros((), f32)
                di_dteff = jnp.zeros((), f32)
                di_y = jnp.zeros((batch, dim), f32)
                di_ynew = jnp.zeros((batch, dim), f32)
                if n_save:
                    # Reverse cursor (see ops.pallas_solve): this accepted
                    # step owns rows rcur-1, rcur-2, ... while their save
                    # time lies strictly above the step start t_i.
                    acc_b = acc_f > 0.5

                    def save_cond(c_):
                        r = c_[0]
                        sa_r = sar[jnp.maximum(r - 1, 0)]
                        return acc_b & (r > cur0v) & (sa_r - t_i > 0.0)

                    def save_body(c_):
                        r, a_t, a_dt, a_y, a_yn = c_
                        sa_r = sar[r - 1]
                        ct_row = ctysr_in[pl.ds(r - 1, 1)][0]

                        def lin(t_, dte, yy, yn):
                            thf = (sa_r - t_) / jnp.where(
                                dte == 0.0, 1.0, dte)
                            return _lin_row(thf, yy, yn)

                        _, lvjp = jax.vjp(lin, t_i, dt_eff, y_i, y_out)
                        l_t, l_dt, l_y, l_yn = lvjp(ct_row)
                        return (r - 1, a_t + l_t, a_dt + l_dt, a_y + l_y,
                                a_yn + l_yn)

                    (rcur, di_t, di_dteff, di_y, di_ynew) = lax.while_loop(
                        save_cond, save_body,
                        (rcur, di_t, di_dteff, di_y, di_ynew))

                seeds = (
                    ct_t, ct_dt, ct_qold,
                    ct_y + di_ynew,  # y_out (== y_new where windows fire)
                    ct_th, ct_tw, ct_tz,
                    cttelt[i],
                    ctteldt[i] + di_dteff,
                    cttele[i], cttelg[i],
                    jnp.zeros((), f32), jnp.zeros((), f32),
                )
                (d_t, d_dt, d_q, d_y, d_th, d_tw, d_tz, _d_xw, _d_xz,
                 d_t1, d_sp, d_ls) = vjp(seeds)
                return (
                    d_t + di_t, d_dt, d_q, d_y + di_y, d_th, d_tw, d_tz,
                    ct_t1a + d_t1, ct_spana + d_sp, rcur,
                ) + tuple(a + b for a, b in zip(ct_ls, d_ls))

            out = lax.fori_loop(0, ns, body, carry0)
            (ct_t, ct_dt, _ct_qold, ct_y, _ct_th, _ct_tw, _ct_tz,
             ct_t1a, ct_spana, _rcur) = out[:10]
            ct_ls = out[10:]
            cty0r[:] = ct_y
            if n_save:
                # Aliased pass-through; only the consumed range [cur0,
                # curf) is zeroed (see ops.pallas_solve).
                def zero_row(r, _):
                    ctys0r[pl.ds(r, 1)] = jnp.zeros((1, batch, dim), f32)
                    return 0

                lax.fori_loop(cur0v, rcur0, zero_row, 0)
            for r, v in zip(ctleaf_refs, ct_ls):
                r[:] = v
            # span = t1 - t0: route the accumulated span cotangent.
            ctt0r[0, 0] = ct_t - ct_spana
            ctt1r[0, 0] = ct_t1a + ct_spana
            ctdt0r[0, 0] = ct_dt

        return kernel

    # ------------------------------------------------------------------
    # jax-level wrappers
    # ------------------------------------------------------------------

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)

    def _s(x):
        return jnp.reshape(jnp.asarray(x, f32), (1, 1))

    def _forward(t0, t1, dt0, y0, ys0, saveat, xi_w, xi_z, leaves):
        batch, dim = y0.shape
        dpad = _pad128(dim)
        n_leaves = len(leaves)
        ins = [_s(t0), _s(t1), _s(dt0), y0]
        in_specs = [smem] * 3 + [vmem]
        aliases = {}
        if n_save:
            sa1 = jnp.asarray(saveat, f32)
            cur0 = jnp.reshape(jnp.sum(
                (sa1 - t0 <= 0).astype(i32)), (1, 1))
            ins += [sa1, cur0, ys0]
            in_specs += [smem, smem, vmem]
            aliases[6] = 1  # ys0 -> ys output (in-place row updates)
        ins += list(leaves)
        in_specs += [vmem] * n_leaves
        ins += [xi_w, xi_z]
        in_specs += [anym, anym]

        outs_shape = [jax.ShapeDtypeStruct((batch, dim), y0.dtype)]
        out_specs = [vmem]
        if n_save:
            outs_shape.append(jax.ShapeDtypeStruct((n_save, batch, dim),
                                                   y0.dtype))
            out_specs.append(vmem)
        outs_shape += [jax.ShapeDtypeStruct((max_steps,), f32)] * 9
        out_specs += [smem] * 9
        # final scalars (tf, dtf, qoldf, na, nr, done, curf)
        outs_shape += [jax.ShapeDtypeStruct((1, 1), f32)] * 3
        outs_shape += [jax.ShapeDtypeStruct((1, 1), i32)] * 4
        out_specs += [smem] * 7
        outs_shape += [jax.ShapeDtypeStruct((max_steps, batch, dpad),
                                            f32)] * 3
        out_specs += [anym] * 3

        res = pl.pallas_call(
            make_fwd_kernel(n_leaves),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=outs_shape,
            scratch_shapes=[
                pltpu.VMEM((batch, dpad), f32),
                pltpu.VMEM((batch, dpad), f32),
                pltpu.VMEM((batch, dpad), f32),
                pltpu.VMEM((batch, dpad), f32),
                pltpu.VMEM((batch, dpad), f32),
                pltpu.SemaphoreType.DMA((5,)),
            ],
            input_output_aliases=aliases,
            interpret=interpret,
        )(*ins)
        k = 0
        y1 = res[k]; k += 1
        ys = None
        if n_save:
            ys = res[k]; k += 1
        (telt, teldt, tele, telg, telacc,
         ht, hdt, hqold, hth) = res[k:k + 9]; k += 9
        tf, dtf, qoldf, na, nr, done, curf = res[k:k + 7]; k += 7
        hy, hw, hz = res[k:k + 3]
        # Mask the uninitialized rows beyond the executed step count (the
        # kernel skips in-kernel zeroing; masked reductions multiply).
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
        resid = (ht, hdt, hqold, hth, hy, hw, hz, na[0, 0] + nr[0, 0],
                 curf)
        return outs, resid

    @jax.custom_vjp
    def solve(t0, t1, dt0, y0, ys0, saveat, xi_w, xi_z, leaves):
        outs, _ = _forward(t0, t1, dt0, y0, ys0, saveat, xi_w, xi_z,
                           leaves)
        return outs

    def solve_fwd(t0, t1, dt0, y0, ys0, saveat, xi_w, xi_z, leaves):
        outs, resid = _forward(t0, t1, dt0, y0, ys0, saveat, xi_w, xi_z,
                               leaves)
        return outs, (resid, t0, t1, y0, ys0, saveat, xi_w, xi_z, leaves)

    def _mat(ct, like):
        if ct is None or (hasattr(ct, "dtype")
                          and ct.dtype == jax.dtypes.float0):
            return jnp.zeros(jnp.shape(like), jnp.result_type(like, f32))
        return ct

    def solve_bwd(res, cts):
        # PRECISION IS LOAD-BEARING: custom_vjp backwards are traced
        # during grad transposition, OUTSIDE whole_solve_sdeint's
        # default_matmul_precision("highest") context. The bwd kernel's
        # in-kernel jax.vjp of the trial step traces the user's
        # drift/diffusion dots, which on TPU default to bf16 — measured
        # round 4: fused saveat gradients off by up to 7x relative vs
        # the unfused adjoint until this context was added
        # (tools/tpu_regressions.py::sde_whole_solve_grads).
        with jax.default_matmul_precision("highest"):
            return _solve_bwd_impl(res, cts)

    def _solve_bwd_impl(res, cts):
        (resid, t0, t1, y0, ys0, saveat, xi_w, xi_z, leaves) = res
        ht, hdt, hqold, hth, hy, hw, hz, nsteps, curf = resid
        (ct_y1, ct_ys, ct_tel, ct_tf, ct_dtf, ct_qoldf,
         _na, _nr, _done) = cts
        batch, dim = y0.shape
        dpad = _pad128(dim)
        n_leaves = len(leaves)
        zs = jnp.zeros((max_steps,), f32)

        ins = [
            _s(t0), _s(t1),
            jnp.reshape(jnp.asarray(nsteps, i32), (1, 1)),
            _s(_mat(ct_tf, 0.0)), _s(_mat(ct_dtf, 0.0)),
            _s(_mat(ct_qoldf, 0.0)),
            ht, hdt, hqold, hth,
            _mat(ct_tel.t, zs), _mat(ct_tel.dt, zs),
            _mat(ct_tel.eest, zs), _mat(ct_tel.eigen_est, zs),
            _mat(ct_y1, y0),
        ]
        in_specs = ([smem] * 2 + [smem] + [smem] * 3 + [smem] * 8 + [vmem])
        aliases = {}
        if n_save:
            sa1 = jnp.asarray(saveat, f32)
            cur0 = jnp.reshape(jnp.sum(
                (sa1 - t0 <= 0).astype(i32)), (1, 1))
            ins += [sa1, cur0, curf, _mat(ct_ys, ys0)]
            in_specs += [smem, smem, smem, vmem]
            aliases[18] = 1  # ct_ys -> ct_ys0 output
        ins += list(leaves)
        in_specs += [vmem] * n_leaves
        ins += [xi_w, xi_z, hy, hw, hz]
        in_specs += [anym] * 5

        outs_shape = [jax.ShapeDtypeStruct((batch, dim), f32)]
        out_specs = [vmem]
        if n_save:
            outs_shape.append(jax.ShapeDtypeStruct((n_save, batch, dim),
                                                   f32))
            out_specs.append(vmem)
        leaf_shapes = tuple(tuple(l.shape) for l in leaves)
        outs_shape += [jax.ShapeDtypeStruct(s, f32) for s in leaf_shapes]
        out_specs += [vmem] * n_leaves
        outs_shape += [jax.ShapeDtypeStruct((1, 1), f32)] * 3
        out_specs += [smem] * 3

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
                pltpu.VMEM((batch, dpad), f32),
                pltpu.SemaphoreType.DMA((5,)),
            ],
            input_output_aliases=aliases,
            interpret=interpret,
        )(*ins)
        k = 0
        ct_y0 = res_b[k]; k += 1
        ct_ys0 = ()
        if n_save:
            ct_ys0 = res_b[k].astype(ys0.dtype); k += 1
        ct_leaves = [a.astype(l.dtype)
                     for a, l in zip(res_b[k:k + n_leaves], leaves)]
        k += n_leaves
        ct_t0 = res_b[k][0, 0]; k += 1
        ct_t1 = res_b[k][0, 0]; k += 1
        ct_dt0 = res_b[k][0, 0]
        ct_sa = jnp.zeros_like(saveat) if n_save else ()
        # noise draws are non-differentiable (as the RNG key is in
        # ops.sde's adjoint mode)
        return (ct_t0, ct_t1, ct_dt0, ct_y0.astype(y0.dtype), ct_ys0,
                ct_sa, jnp.zeros_like(xi_w), jnp.zeros_like(xi_z),
                ct_leaves)

    solve.defvjp(solve_fwd, solve_bwd)
    return solve


# ---------------------------------------------------------------------------
# sdeint-compatible front end
# ---------------------------------------------------------------------------


def whole_solve_sdeint(
    drift: Callable,
    diffusion: Callable,
    y0: jnp.ndarray,
    t0,
    t1,
    args: Any,
    *,
    key: jax.Array,
    solver: str = "sosri",
    rtol: float = 1e-2,
    atol: float = 1e-2,
    dt0: Optional[float] = None,
    max_steps: int = 256,
    saveat: Optional[jnp.ndarray] = None,
    controller: Optional[PIController] = None,
    matmul_precision: Optional[str] = "highest",
) -> SDESolution:
    """Run a whole-solve fused SDE integration with ``sdeint``'s exact
    prologue and return an identical ``SDESolution``. ``drift(t, y,
    args)`` / ``diffusion(t, y, args)`` take the caller's args pytree;
    its leaves are flattened 2-D for the kernel and rebuilt inside, so
    any Mosaic-lowerable dynamics works without a hand-written form.
    """
    if matmul_precision is not None:
        with jax.default_matmul_precision(matmul_precision):
            return whole_solve_sdeint(
                drift, diffusion, y0, t0, t1, args,
                key=key, solver=solver, rtol=rtol, atol=atol, dt0=dt0,
                max_steps=max_steps, saveat=saveat, controller=controller,
                matmul_precision=None,
            )
    t0 = jnp.asarray(t0, f32)
    t1 = jnp.asarray(t1, f32)
    span = t1 - t0

    leaves_raw, treedef = jax.tree_util.tree_flatten(args)
    shapes = [l.shape for l in leaves_raw]
    leaves = [l.reshape((1, -1)) if l.ndim < 2 else l for l in leaves_raw]

    def rebuild(leaf_vals):
        return jax.tree_util.tree_unflatten(
            treedef, [v.reshape(s) for v, s in zip(leaf_vals, shapes)])

    drift_fn = lambda t, y, lv: drift(t, y, rebuild(lv))
    diffusion_fn = lambda t, y, lv: diffusion(t, y, rebuild(lv))

    dt_init = jnp.asarray(dt0 if dt0 is not None else 0.01, f32)
    dt_init = jnp.minimum(dt_init, span) if dt0 is None else dt_init

    # Noise is presampled at the REAL batch shape first so each real
    # lane's draws match the unfused ``sdeint`` bit-for-bit (the tested
    # draw-for-draw parity contract), THEN the batch is padded to the
    # 8-row sublane alignment Mosaic requires (see
    # ops.pallas_solve.whole_solve_odeint — a (100, 2) solve, the
    # reference's literal sde_toy workload, faulted the TPU worker).
    # Pad rows carry zero noise and are masked out of the norms
    # (``n_real``), so step control and gradients match the unpadded
    # solve. Applied on every backend so CPU CI exercises the same path.
    batch_real = y0.shape[0]
    xi_w, xi_z = presample_noise(key, y0.shape, y0.dtype, max_steps)
    n_real = None
    if batch_real % 8:
        n_real = batch_real
        nprows = 8 - batch_real % 8
        y0 = jnp.concatenate(
            [y0, jnp.broadcast_to(y0[-1:], (nprows,) + y0.shape[1:])], 0)
        zrows = jnp.zeros((max_steps, nprows, y0.shape[1]), y0.dtype)
        xi_w = jnp.concatenate([xi_w, zrows], 1)
        xi_z = jnp.concatenate([xi_z, zrows], 1)

    batch, dim = y0.shape
    dpad = _pad128(dim)
    pad = dpad - dim
    if pad:
        zp = jnp.zeros((max_steps, batch, pad), y0.dtype)
        xi_w = jnp.concatenate([xi_w, zp], -1)
        xi_z = jnp.concatenate([xi_z, zp], -1)

    n_save = 0
    ys0 = ()
    sa = ()
    if saveat is not None:
        # The cursor-based save kernel takes the sorted grid as-is.
        sa = jnp.asarray(saveat, f32)
        n_save = int(sa.shape[0])
        at_start = sa - t0 <= 0
        ys0 = jnp.where(
            at_start.reshape((-1, 1, 1)), y0[None],
            jnp.zeros((n_save,) + y0.shape, y0.dtype))

    solve = make_sde_whole_solve(
        drift_fn, diffusion_fn, solver, rtol, atol, controller=controller,
        max_steps=max_steps, n_save=n_save, n_real=n_real,
    )
    (y1, ys, tel, _tf, _dtf, _qoldf, na, nr, done) = solve(
        t0, t1, dt_init, y0, ys0, sa, xi_w, xi_z, list(leaves))
    if n_real is not None:
        y1 = y1[:batch_real]
        if n_save:
            ys = ys[:, :batch_real]
    tab = get_tableau(solver)
    nsteps = na + nr
    stats = SDEStats(
        nfe1=drift_evals_per_step(tab) * nsteps,
        nfe2=diffusion_evals_per_step(tab) * nsteps,
        naccept=na, nreject=nr, success=done,
    )
    return SDESolution(
        y1=y1,
        ys=ys if saveat is not None else None,
        ts=saveat,
        stats=stats,
        telemetry=tel,
    )
