"""Regularization library: the ICML'21 solver-heuristic regularizers.

The reference builds regularizers by attaching a ``SavingCallback`` that
records a scalar per accepted solver step, then aggregating ``sv.saveval``
with ``mean``/``maximum``/``sum`` and scaling by an annealed lambda
(reference: experiments/mnist_node.jl:62-108, experiments/latent_ode.jl:
154-194). Here the solver emits `StepTelemetry` streams and the same
regularizers are masked reductions over them:

* ``error_estimate``    — ERNODE: ``EEst * dt`` per accepted step
* ``stiffness_estimate``— SRNODE: ``|eigen_est| / stability_size``
* ``error_stiffness``   — the combined form
* ``kinetic``/Jacobian  — RNODE terms live in the FFJORD augmented state
  (see models.ffjord), not here
* STEER time-span / saveat sampling
* exponential-decay and KL-annealing lambda schedules

All reductions are differentiable; gradients flow through ``EEst`` and
``dt`` exactly as the reference's tape flows through the TrackedReal
callback values.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from regneuralde_tpu.ops.ode import StepTelemetry

__all__ = [
    "masked_mean",
    "masked_max",
    "masked_sum",
    "aggregate",
    "error_estimate",
    "stiffness_estimate",
    "error_stiffness",
    "exp_decay_schedule",
    "kl_anneal_schedule",
    "steer_tspan",
    "steer_tspan_per_sample",
    "steer_saveat",
    "steer_saveat_per_sample",
]


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(values.dtype)
    return jnp.sum(values * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_max(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    neg_inf = jnp.asarray(-jnp.inf, values.dtype)
    masked = jnp.where(mask, values, neg_inf)
    out = jnp.max(masked)
    # No accepted steps -> 0 (can happen only on failed/empty solves).
    return jnp.where(jnp.any(mask), out, jnp.zeros((), values.dtype))


def masked_sum(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(values * mask.astype(values.dtype))


_AGGREGATIONS = {"mean": masked_mean, "max": masked_max, "sum": masked_sum}


def aggregate(values: jnp.ndarray, mask: jnp.ndarray, agg: str) -> jnp.ndarray:
    """Aggregate per-step values over the accepted-step mask.

    ``agg`` mirrors the reference's choice of ``mean`` (error_est),
    ``maximum`` (stiff_est on MNIST, experiments/mnist_node.jl:80) or
    ``sum`` (toy SDE, experiments/sde_toy_problem.jl:32).
    """
    try:
        return _AGGREGATIONS[agg](values, mask)
    except KeyError:
        raise ValueError(f"unknown aggregation {agg!r}; use mean/max/sum") from None


def _sanitize(x: jnp.ndarray) -> jnp.ndarray:
    """Zero out NaN entries, as the reference's save_funcs do
    (experiments/mnist_node.jl:76-79 returns 0 for NaN/zero estimates)."""
    return jnp.where(jnp.isnan(x), jnp.zeros_like(x), x)


def error_estimate(tel: StepTelemetry, agg: str = "mean") -> jnp.ndarray:
    """ERNODE regularizer: ``agg`` over accepted steps of ``EEst * dt``.

    Reference: save_func at experiments/mnist_node.jl:67 with agg=mean.
    """
    vals = _sanitize(tel.eest * tel.dt.astype(tel.eest.dtype))
    return aggregate(vals, tel.accepted, agg)


def stiffness_estimate(
    tel: StepTelemetry, stability_size: float, agg: str = "max"
) -> jnp.ndarray:
    """SRNODE regularizer: ``agg`` of ``|eigen_est| / stability_size``.

    Reference: experiments/mnist_node.jl:70-81 (agg=maximum, lambda=0.1,
    stability_size = OrdinaryDiffEq.alg_stability_size(Tsit5())).
    """
    vals = _sanitize(jnp.abs(tel.eigen_est)) / stability_size
    return aggregate(vals, tel.accepted, agg)


def error_stiffness(
    tel: StepTelemetry, stability_size: float, agg: str = "mean",
    stiff_weight: float = 0.1,
) -> jnp.ndarray:
    """Combined form: ``EEst*dt + 0.1 * eigen_est / stability_size``.

    Reference: experiments/mnist_node.jl:82-99 (note the reference uses the
    *signed* eigen_est here, unlike the pure stiffness variant).
    """
    err = _sanitize(tel.eest * tel.dt.astype(tel.eest.dtype))
    stiff = _sanitize(tel.eigen_est) / stability_size
    return aggregate(err + stiff_weight * stiff, tel.accepted, agg)


def exp_decay_schedule(lambda0: float, lambda1: float, epochs: int):
    """``lambda(t) = lambda0 * exp(-k t)`` with ``k = log(l0/l1)/epochs``.

    Reference: experiments/mnist_node.jl:106-108.
    """
    import math

    k = math.log(lambda0 / lambda1) / epochs

    def schedule(epoch: Union[int, jnp.ndarray]) -> jnp.ndarray:
        return lambda0 * jnp.exp(-k * jnp.asarray(epoch, jnp.float32))

    return schedule


def kl_anneal_schedule(wait: int = 10, rate: float = 0.99):
    """``lambda_k(t) = max(0, 1 - rate^(t - wait))``.

    Reference: experiments/latent_ode.jl:194.
    """

    def schedule(epoch: Union[int, jnp.ndarray]) -> jnp.ndarray:
        e = jnp.asarray(epoch, jnp.float32)
        return jnp.maximum(0.0, 1.0 - rate ** (e - wait))

    return schedule


def steer_tspan(key: jax.Array, t0: float = 0.0, t1: float = 1.0, b: float = 0.5):
    """STEER: sample the end time ``t1 ~ U(t1 - b, t1 + b)``.

    Reference: experiments/mnist_node.jl:104-105
    (``1 - (2 rand - 1) * b``).
    """
    u = jax.random.uniform(key, (), minval=-b, maxval=b)
    return jnp.asarray(t0, jnp.float32), jnp.asarray(t1, jnp.float32) + u


def steer_tspan_per_sample(
    key: jax.Array, batch: int, t0: float = 0.0, t1: float = 1.0,
    b: float = 0.5,
):
    """STEER with an independent end-time draw per sample,
    ``t1_i ~ U(t1 - b, t1 + b)``.

    The reference draws ONE shared ``t1`` per minibatch
    (experiments/mnist_node.jl:104-105) because its solver integrates the
    batch as one state; per-sample adaptive stepping
    (ops.odeint_per_sample / NeuralODE(per_sample=True)) accepts a
    ``(batch,)`` ``t1``, making the per-sample form of the STEER
    regularizer expressible. Returns ``(t0_scalar, t1_(batch,))``.
    """
    u = jax.random.uniform(key, (batch,), minval=-b, maxval=b)
    return jnp.asarray(t0, jnp.float32), jnp.asarray(t1, jnp.float32) + u


def steer_saveat(
    key: jax.Array, saveat: jnp.ndarray, lo: float = 0.0, hi: float = 1.0
) -> jnp.ndarray:
    """STEER for saveat grids: jitter interior points by +-dt/2, clamped.

    Reference: experiments/latent_ode.jl:197-208 (``sample_tbounds``). The
    first point is kept fixed; each later point moves by up to half the gap
    to its predecessor.
    """
    dt = saveat[1:] - saveat[:-1] + jnp.finfo(saveat.dtype).eps
    u = jax.random.uniform(key, dt.shape, minval=-1.0, maxval=1.0)
    jittered = saveat[1:] + u * dt / 2.0
    out = jnp.concatenate([saveat[:1], jittered])
    return jnp.clip(out, lo, hi)


def steer_saveat_per_sample(
    key: jax.Array, saveat: jnp.ndarray, batch: int,
    lo: float = 0.0, hi: float = 1.0,
) -> jnp.ndarray:
    """:func:`steer_saveat` with an independent jitter draw per sample.

    Returns a ``(batch, n_save)`` grid for per-sample solves
    (``saveat`` rows stay sorted: each point moves by at most half the
    gap to its predecessor, the same bound the shared form uses). The
    reference jitters ONE shared grid per minibatch
    (experiments/latent_ode.jl:197-208); per-sample adaptive stepping
    accepts per-sample grids, making the per-sample form expressible.
    """
    return jax.vmap(
        lambda k: steer_saveat(k, saveat, lo=lo, hi=hi)
    )(jax.random.split(key, batch))
