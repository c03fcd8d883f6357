"""Adaptive explicit Runge-Kutta ODE integration as a single XLA program.

This layer replaces the reference's use of ``OrdinaryDiffEq.solve`` with
``SensitivityADPassThrough`` — i.e. "backprop through the solver" with a
tape AD (reference: src/models/neural_ode.jl:110-144) — with a TPU-native
design:

* The adaptive loop is a **bounded ``lax.scan`` over ``max_steps`` trial
  steps with live/accept masks**, so ``jax.grad`` performs the discrete
  adjoint through every accepted and rejected step (XLA cannot reverse-
  differentiate ``while_loop``). Each step body is wrapped in
  ``jax.checkpoint`` so backward memory is O(max_steps * state) instead of
  O(max_steps * stages * state) — the analogue of the reference's tape-size
  pain (reference: experiments/mnist_node.jl:237 forces GC per batch).
* A ``lax.while_loop`` fast path (``mode="while"``) runs exactly the same
  step function for inference / NFE measurement without paying for dead
  iterations; it produces an identical `ODESolution`, it just isn't
  reverse-differentiable.
* Solver internals are **first-class differentiable outputs**: every trial
  step emits ``(t, dt, EEst, eigen_est, accepted)`` streams. The reference
  harvests the same quantities via ``SavingCallback((u,t,int) ->
  int.EEst * int.dt)`` (reference: src/models/neural_ode.jl:116,126-127);
  here the regularizers in ``regneuralde_tpu.reg`` are masked reductions
  over these streams.
* ``eigen_est`` is the power-iteration-like stiffness estimate the
  reference obtains via the ``AutoTsit5(Tsit5())`` composite hack
  (reference: experiments/latent_ode.jl:128-136): the norm ratio of the
  last two stage derivatives over the last two stage states.
* The whole minibatch is one ODE state with ONE global error norm, matching
  reference semantics; under data parallelism pass ``axis_name`` and the
  norms psum over the mesh axis so step control is globally synchronized.

Dense output for ``saveat`` uses a cubic Hermite interpolant over each
accepted step (free: uses the FSAL derivatives already computed).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from regneuralde_tpu.ops.controller import PIController, initial_step_size
from regneuralde_tpu.ops.norms import (
    error_ratio,
    hairer_norm,
    tree_lincomb,
    tree_sub,
    tree_where,
    tree_zeros_like,
)
from regneuralde_tpu.ops.tableaus import ExplicitRKTableau, get_tableau

Pytree = Any


class StepTelemetry(NamedTuple):
    """Per-trial-step solver internals, shape ``(max_steps,)`` each.

    ``accepted`` marks live accepted steps; ``live`` marks trial steps that
    actually executed (the bounded scan keeps iterating after integration
    finishes, emitting ``live=False`` rows). Regularizers reduce these
    streams under the masks.
    """

    t: jnp.ndarray  # endpoint of the trial step (== save time when accepted)
    dt: jnp.ndarray  # dt used for the trial step
    eest: jnp.ndarray  # tolerance-normalized local error estimate
    eigen_est: jnp.ndarray  # stiffness estimate (stage-ratio power estimate)
    accepted: jnp.ndarray  # bool
    live: jnp.ndarray  # bool


class ODEStats(NamedTuple):
    nfe: jnp.ndarray  # number of dynamics evaluations (matches destats.nf)
    naccept: jnp.ndarray
    nreject: jnp.ndarray
    success: jnp.ndarray  # reached t1 within max_steps


class ODESolution(NamedTuple):
    y1: Pytree  # state at t1
    ys: Optional[Pytree]  # states at `saveat` (leading axis = len(saveat))
    ts: Optional[jnp.ndarray]  # the saveat times
    stats: ODEStats
    telemetry: StepTelemetry


class _Carry(NamedTuple):
    t: jnp.ndarray
    dt: jnp.ndarray
    qold: jnp.ndarray
    y: Pytree
    f0: Pytree  # FSAL derivative at (t, y)
    done: jnp.ndarray
    step: jnp.ndarray
    naccept: jnp.ndarray
    nreject: jnp.ndarray
    ys_buf: Optional[Pytree]


def _hermite_eval(theta, h, y0, y1, f0, f1):
    """Cubic Hermite interpolation on one step; ``theta`` has shape (S,).

    Broadcasts the (S,) interpolation grid against every state leaf,
    returning leaves of shape ``(S,) + leaf.shape``.
    """

    def leaf(y0l, y1l, f0l, f1l):
        th = theta.reshape((-1,) + (1,) * y0l.ndim).astype(y0l.dtype)
        hh = jnp.asarray(h, y0l.dtype)
        dy = y1l - y0l
        return (
            (1 - th) * y0l
            + th * y1l
            + th * (th - 1) * ((1 - 2 * th) * dy + (th - 1) * hh * f0l + th * hh * f1l)
        )

    return jax.tree_util.tree_map(leaf, y0, y1, f0, f1)


def _make_step_fn(
    func: Callable,
    args,
    tab: ExplicitRKTableau,
    ctrl: PIController,
    t1,
    tdir,
    span,
    rtol,
    atol,
    saveat: Optional[jnp.ndarray],
    axis_name: Optional[str],
    stage_sweep: Optional[Callable] = None,
):
    if not tab.fsal:
        raise NotImplementedError("only FSAL tableaus are supported")
    n_stages = tab.num_stages
    time_dtype = jnp.result_type(t1)
    err_dtype = jnp.promote_types(time_dtype, jnp.float32)

    def generic_sweep(t, dt_eff, y, f0, args_):
        # Stage sweep. FSAL: the advancing solution equals the input of the
        # final stage, whose derivative seeds the next step's k1.
        ks = [f0]
        y_stage = y
        for i in range(1, n_stages):
            y_stage = tree_lincomb(y, dt_eff, tab.a[i - 1], ks)
            ks.append(func(t + tab.c[i] * dt_eff, y_stage, args_))
        y_new = y_stage  # b row == last a row (FSAL)
        g_prev = tree_lincomb(y, dt_eff, tab.a[n_stages - 3], ks[: n_stages - 2])

        # Embedded error, regrouped as sum(btilde_i * (k_i - k1)) — exact
        # because sum(btilde) == 0, but numerically crucial in float32: the
        # naive combination cancels O(1) stage values down to an O(dt^5)
        # residual, so its rounding noise (~1e-7 absolute) floors the error
        # estimate and pins the controller at a tiny dt at tight tolerances.
        # Differencing against k1 first makes every summand O(dt), dropping
        # the noise floor to the irreducible stage-storage rounding and
        # letting dt open up to the true-error limit (~10x fewer steps at
        # rtol=1.4e-8 on the MNIST dynamics).
        err = jax.tree_util.tree_map(
            lambda *k_leaves: dt_eff * sum(
                c * (kl - k_leaves[0]) for c, kl in zip(tab.btilde[1:], k_leaves[1:])
            ),
            *ks,
        )
        return y_new, ks[-1], err, ks[-2], g_prev

    sweep = stage_sweep if stage_sweep is not None else generic_sweep

    def step(carry: _Carry):
        t, dt, qold, y, f0 = carry.t, carry.dt, carry.qold, carry.y, carry.f0

        remaining = t1 - t
        is_last = (dt - remaining) * tdir >= 0
        dt_eff = jnp.where(is_last, remaining, dt)

        y_new, k_last, err, k_prev, g_prev = sweep(t, dt_eff, y, f0, args)
        eest = error_ratio(err, y, y_new, rtol, atol, axis_name=axis_name)
        eest = eest.astype(err_dtype)

        # Stiffness estimate from the last two internal stages, as
        # OrdinaryDiffEq's composite algorithms compute it.
        eig_num = hairer_norm(tree_sub(k_last, k_prev), axis_name=axis_name)
        eig_den = hairer_norm(tree_sub(y_new, g_prev), axis_name=axis_name)
        eigen_est = jnp.where(
            eig_den > 0, eig_num / jnp.maximum(eig_den, 1e-30), 0.0
        ).astype(err_dtype)

        accept = eest <= 1.0
        dt_next, qold_next = ctrl.propose(dt_eff, eest, qold, accept)
        # dtmax clamp: never propose beyond the total span.
        dt_next = jnp.sign(dt_next) * jnp.minimum(jnp.abs(dt_next), span)

        t_new = jnp.where(accept, jnp.where(is_last, t1, t + dt_eff), t)
        done_new = accept & is_last
        y_out = tree_where(accept, y_new, y)
        f0_out = tree_where(accept, k_last, f0)

        ys_buf = carry.ys_buf
        if saveat is not None:
            t_end = jnp.where(is_last, t1, t + dt_eff)
            in_window = (
                accept
                & ((saveat - t) * tdir > 0)
                & ((saveat - t_end) * tdir <= 0)
            )
            theta = (saveat - t) / jnp.where(dt_eff == 0, 1.0, dt_eff)
            y_interp = _hermite_eval(theta, dt_eff, y, y_new, f0, k_last)
            ys_buf = jax.tree_util.tree_map(
                lambda buf, yi: jnp.where(
                    in_window.reshape((-1,) + (1,) * (buf.ndim - 1)), yi, buf
                ),
                ys_buf,
                y_interp,
            )

        new_carry = _Carry(
            t=t_new.astype(time_dtype),
            dt=dt_next,
            qold=qold_next,
            y=y_out,
            f0=f0_out,
            done=done_new,
            step=carry.step + 1,
            naccept=carry.naccept + accept.astype(jnp.int32),
            nreject=carry.nreject + (~accept).astype(jnp.int32),
            ys_buf=ys_buf,
        )
        out = StepTelemetry(
            t=jnp.where(is_last, t1, t + dt_eff).astype(time_dtype),
            dt=dt_eff,
            eest=eest,
            eigen_est=eigen_est,
            accepted=accept,
            live=jnp.asarray(True),
        )
        return new_carry, out

    def noop(carry: _Carry):
        zero = jnp.zeros((), time_dtype)
        out = StepTelemetry(
            t=zero,
            dt=zero,
            eest=jnp.zeros((), err_dtype),
            eigen_est=jnp.zeros((), err_dtype),
            accepted=jnp.asarray(False),
            live=jnp.asarray(False),
        )
        return carry, out

    return step, noop


def odeint(
    func: Callable[[Any, Pytree, Any], Pytree],
    y0: Pytree,
    t0,
    t1,
    args: Any = None,
    *,
    solver: str = "tsit5",
    rtol: float = 1e-7,
    atol: float = 1e-7,
    dt0: Optional[float] = None,
    max_steps: int = 256,
    saveat: Optional[jnp.ndarray] = None,
    controller: Optional[PIController] = None,
    mode: str = "scan",
    remat: bool = True,
    axis_name: Optional[str] = None,
    matmul_precision: Optional[str] = "highest",
    stage_sweep: Optional[Callable] = None,
) -> ODESolution:
    """Integrate ``dy/dt = func(t, y, args)`` from ``t0`` to ``t1``.

    Args:
      func: dynamics ``f(t, y, args) -> dy``; ``y`` may be any pytree.
      y0: initial state (pytree of arrays).
      t0, t1: scalars; ``t1 < t0`` integrates backwards (used by FFJORD
        sampling, reference: src/models/ffjord.jl:160-167).
      args: passed through to ``func`` (typically model parameters).
      solver: tableau name (``tsit5`` / ``bosh3``).
      rtol, atol: tolerances; the reference experiments use 1.4e-8
        (reference: experiments/mnist_node.jl:122-123).
      dt0: initial step; ``None`` uses Hairer's heuristic (one extra NFE,
        matching OrdinaryDiffEq's accounting).
      max_steps: trial-step bound of the scan; the solve fails
        (``stats.success == False``) if t1 is not reached within it.
      saveat: optional 1-D array of times at which to emit interpolated
        states (reference: latent ODE's 49 Physionet timestamps,
        experiments/latent_ode.jl:137-147).
      mode: ``"scan"`` (differentiable, bounded) or ``"while"`` (early
        exit, not reverse-differentiable — for inference/NFE measurement).
      remat: checkpoint each step body (scan mode) to bound backward memory.
      axis_name: mesh axis for globally synchronized step control under
        ``shard_map`` data parallelism.
      matmul_precision: matmul precision for everything inside the solve.
        TPU MXUs default to bfloat16 multiplies, whose rounding noise
        (~4e-3 relative) would swamp the embedded error estimate at tight
        tolerances — the controller then grinds dt to the noise floor and
        NFE explodes ~25x. ``"highest"`` (default) makes the tolerance
        meaningful on TPU and is a no-op on CPU; pass ``None`` to keep the
        ambient precision for loose-tolerance speed runs.
    """
    if matmul_precision is not None:
        with jax.default_matmul_precision(matmul_precision):
            return odeint(
                func, y0, t0, t1, args,
                solver=solver, rtol=rtol, atol=atol, dt0=dt0,
                max_steps=max_steps, saveat=saveat, controller=controller,
                mode=mode, remat=remat, axis_name=axis_name,
                matmul_precision=None, stage_sweep=stage_sweep,
            )
    tab = get_tableau(solver)
    ctrl = controller or PIController.for_order(tab.order)

    time_dtype = jnp.result_type(jnp.asarray(t0).dtype, jnp.float32)
    t0 = jnp.asarray(t0, time_dtype)
    t1 = jnp.asarray(t1, time_dtype)
    tdir = jnp.sign(t1 - t0)
    span = jnp.abs(t1 - t0)

    f_init = func(t0, y0, args)
    nfe_init = 1
    if dt0 is None:
        dt_init, _ = initial_step_size(
            func, t0, y0, f_init, args, tab.order, rtol, atol, t1, axis_name=axis_name
        )
        nfe_init = 2
    else:
        dt_init = jnp.asarray(dt0, time_dtype) * tdir

    ys_buf = None
    if saveat is not None:
        saveat = jnp.asarray(saveat, time_dtype)
        ys_buf = jax.tree_util.tree_map(
            lambda l: jnp.zeros((saveat.shape[0],) + l.shape, l.dtype), y0
        )
        # Entries at/before t0 hold the initial state (OrdinaryDiffEq saves
        # u0 when saveat contains t0).
        at_start = (saveat - t0) * tdir <= 0
        ys_buf = jax.tree_util.tree_map(
            lambda buf, y0l: jnp.where(
                at_start.reshape((-1,) + (1,) * y0l.ndim), y0l[None], buf
            ),
            ys_buf,
            y0,
        )

    err_dtype = jnp.promote_types(time_dtype, jnp.float32)
    init = _Carry(
        t=t0,
        dt=dt_init.astype(time_dtype),
        qold=jnp.asarray(ctrl.qoldinit, err_dtype),
        y=y0,
        f0=f_init,
        done=span == 0,
        step=jnp.asarray(0, jnp.int32),
        naccept=jnp.asarray(0, jnp.int32),
        nreject=jnp.asarray(0, jnp.int32),
        ys_buf=ys_buf,
    )

    step_fn, noop_fn = _make_step_fn(
        func, args, tab, ctrl, t1, tdir, span, rtol, atol, saveat, axis_name,
        stage_sweep=stage_sweep,
    )

    if mode == "scan":
        body = lambda c: lax.cond(c.done, noop_fn, step_fn, c)
        if remat:
            body = jax.checkpoint(body)

        def scan_body(carry, _):
            return body(carry)

        final, tel = lax.scan(scan_body, init, None, length=max_steps)
    elif mode == "while":
        tel0 = StepTelemetry(
            t=jnp.zeros((max_steps,), time_dtype),
            dt=jnp.zeros((max_steps,), time_dtype),
            eest=jnp.zeros((max_steps,), err_dtype),
            eigen_est=jnp.zeros((max_steps,), err_dtype),
            accepted=jnp.zeros((max_steps,), bool),
            live=jnp.zeros((max_steps,), bool),
        )

        def while_cond(state):
            carry, _ = state
            return (~carry.done) & (carry.step < max_steps)

        def while_body(state):
            carry, bufs = state
            i = carry.step
            carry2, out = step_fn(carry)
            bufs2 = StepTelemetry(
                *[b.at[i].set(o) for b, o in zip(bufs, out)]
            )
            return carry2, bufs2

        final, tel = lax.while_loop(while_cond, while_body, (init, tel0))
    else:
        raise ValueError(f"unknown mode {mode!r}; use 'scan' or 'while'")

    nsteps = final.naccept + final.nreject
    stats = ODEStats(
        nfe=jnp.asarray(nfe_init, jnp.int32) + (tab.num_stages - 1) * nsteps,
        naccept=final.naccept,
        nreject=final.nreject,
        success=final.done,
    )
    return ODESolution(
        y1=final.y,
        ys=final.ys_buf,
        ts=saveat,
        stats=stats,
        telemetry=tel,
    )
