"""Proportional-integral (PI) step-size control and the initial-dt heuristic.

Matches the defaults OrdinaryDiffEq applies to Tsit5 so that accepted-step
sequences — and therefore NFE counts, the paper's headline metric
(reference: experiments/mnist_node.jl:244-247) — are comparable
tolerance-for-tolerance:

    beta1 = 7 / (10 * order)     (Tsit5: 7/50)
    beta2 = 2 / (5 * order)      (Tsit5: 2/25)
    qmin = 1/5, qmax = 10, gamma = 9/10, qoldinit = 1e-4

All controller arithmetic is traced (differentiable): the reference
deliberately puts the timespan on the AD tape so gradients flow through
``dt`` into the ``EEst * dt`` regularizer (reference: src/utils.jl:21-23);
here the same flow falls out of tracing the controller update.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax.numpy as jnp

from regneuralde_tpu.ops.norms import hairer_norm, Pytree, tree_lincomb, tree_sub

_EEST_FLOOR = 1e-10  # guards 0^beta and its infinite derivative


@dataclasses.dataclass(frozen=True)
class PIController:
    beta1: float
    beta2: float
    qmin: float = 0.2
    qmax: float = 10.0
    gamma: float = 0.9
    qoldinit: float = 1e-4
    # Step-keeping deadband (Hairer's "standard controller" trick): when an
    # accepted step proposes only a mild shrink (1 <= q <= qsteady_max),
    # keep dt unchanged. Without it, float32 noise floors in the error
    # estimate (EEst_noise ~ dt * c) interact with the PI equilibrium
    # (EEst* ~ 0.17) to ratchet dt down far below what the accept criterion
    # (EEst <= 1) requires — a ~4x step-count inflation at tolerances near
    # the float32 noise floor (e.g. the reference's rtol=1.4e-8 in
    # Float32). Set qsteady_max=1.0 to reproduce OrdinaryDiffEq's Tsit5
    # default controller exactly.
    qsteady_max: float = 1.2

    @classmethod
    def for_order(cls, order: int) -> "PIController":
        return cls(beta1=7.0 / (10.0 * order), beta2=2.0 / (5.0 * order))

    def propose(self, dt, eest, qold, accept):
        """One controller update. Returns (dt_next, qold_next).

        Accept:  q = clip(q11 / qold^beta2 / gamma, 1/qmax, 1/qmin)
                 dt_next = dt / q;     qold_next = max(EEst, qoldinit)
        Reject:  dt_next = dt / min(1/qmin, q11 / gamma);  qold unchanged.
        """
        eest_safe = jnp.maximum(eest, _EEST_FLOOR)
        q11 = eest_safe**self.beta1
        q = q11 / (qold**self.beta2)
        q_acc = jnp.clip(q / self.gamma, 1.0 / self.qmax, 1.0 / self.qmin)
        if self.qsteady_max > 1.0:
            in_band = (q_acc >= 1.0) & (q_acc <= self.qsteady_max)
            q_acc = jnp.where(in_band, 1.0, q_acc)
        dt_acc = dt / q_acc
        qold_acc = jnp.maximum(eest, self.qoldinit)

        q_rej = jnp.minimum(1.0 / self.qmin, q11 / self.gamma)
        dt_rej = dt / q_rej

        dt_next = jnp.where(accept, dt_acc, dt_rej)
        qold_next = jnp.where(accept, qold_acc, qold)
        return dt_next, qold_next


def initial_step_size(
    func: Callable,
    t0,
    y0: Pytree,
    f0: Pytree,
    args,
    order: int,
    rtol,
    atol,
    t1,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, Pytree]:
    """Hairer's automatic initial step size (Hairer, Norsett & Wanner II.4).

    Costs one extra function evaluation (returned implicitly via the NFE
    accounting in the caller), matching OrdinaryDiffEq's
    ``ode_determine_initdt`` so the reference's ``destats.nf`` bookkeeping
    lines up. Returns ``(dt0, f_probe)``.
    """
    import jax

    tdir = jnp.sign(t1 - t0)
    span = jnp.abs(t1 - t0)

    def scaled(tree):
        return jax.tree_util.tree_map(
            lambda u, s: u / (atol + jnp.abs(s) * rtol), tree, y0
        )

    d0 = hairer_norm(scaled(y0), axis_name=axis_name)
    d1 = hairer_norm(scaled(f0), axis_name=axis_name)

    dt0 = jnp.where(
        (d0 < 1e-5) | (d1 < 1e-5), jnp.asarray(1e-6, d0.dtype), 0.01 * d0 / d1
    )
    dt0 = jnp.minimum(dt0, span)

    # One explicit Euler probe to estimate the second derivative scale.
    y1 = tree_lincomb(y0, tdir * dt0, (1.0,), (f0,))
    f1 = func(t0 + tdir * dt0, y1, args)
    d2 = hairer_norm(scaled(tree_sub(f1, f0)), axis_name=axis_name) / dt0

    dmax = jnp.maximum(d1, d2)
    dt1 = jnp.where(
        dmax <= 1e-15,
        jnp.maximum(1e-6, dt0 * 1e-3),
        (0.01 / dmax) ** (1.0 / (order + 1)),
    )
    dt = jnp.minimum(jnp.minimum(100.0 * dt0, dt1), span)
    return tdir * dt, f1
