"""Device-mesh parallelism for neural-DE training.

The reference is strictly single-process, single-device (SURVEY §2.3: no
distributed imports anywhere); its only batch semantics is "the whole
minibatch is one ODE state with one global error norm". This module makes
that exact semantics scale over a ``jax.sharding.Mesh``:

* **Batch data parallelism** via ``shard_map``: each chip integrates its
  batch shard, but the error-norm reductions inside the solver ``psum``
  over the mesh axis (``ops.norms.hairer_norm(axis_name=...)``), so every
  chip computes the identical ``EEst`` and the PI controller stays in
  lockstep — accept/reject decisions, step counts, and NFE are *bitwise
  the global-batch values*, not per-shard approximations. The collectives
  are scalar psums per trial step and ride ICI.
* **Gradient data parallelism**: one ``pmean`` of grads per step.
* **Trajectory parallelism for SDEs**: the Monte-Carlo fan-out axis
  (reference: supervised_classification.jl:92) is itself a batch axis and
  shards the same way.

Construct models with ``axis_name=AXIS`` (or pass ``axis_name`` to
``odeint``/``sdeint``) and build the step with ``make_dp_train_step``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from regneuralde_tpu.training import TrainState

AXIS = "data"

__all__ = [
    "AXIS",
    "make_mesh",
    "shard_batch",
    "replicate",
    "make_dp_train_step",
    "make_dp_eval_step",
]


def make_mesh(n_devices: Optional[int] = None, axis: str = AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = AXIS):
    """Place arrays with the leading (batch) axis sharded over the mesh."""

    def put(x):
        x = jnp.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def make_dp_train_step(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = AXIS,
    has_aux: bool = True,
    nan_guard: bool = False,
):
    """Data-parallel ``(state, *batch) -> (state, loss, aux)`` under jit.

    ``loss_fn(params, *batch_shard)`` runs per shard; anything inside it
    that calls the solver with ``axis_name=axis`` participates in the
    globally synchronized step control.

    Gradient semantics: the per-shard loss is ``pmean``'d over the mesh
    axis INSIDE the differentiated function, so ``jax.grad`` computes the
    gradient of the GLOBAL mean loss directly. This is not just style —
    when the loss is coupled across shards through the solver's psum'd
    error norms, cotangents crossing ``psum`` accumulate over shards, and
    the naive "grad per shard, then pmean the grads" recipe overcounts the
    coupled paths by the axis size.
    """

    def global_loss(params, *batch):
        if has_aux:
            loss, aux = loss_fn(params, *batch)
        else:
            loss, aux = loss_fn(params, *batch), ()
        return lax.pmean(loss, axis), aux

    grad_fn = jax.value_and_grad(global_loss, has_aux=True)

    def shard_fn(params, opt_state, step, *batch):
        (loss, aux), grads = grad_fn(params, *batch)
        aux = jax.tree_util.tree_map(lambda a: lax.pmean(a, axis), aux)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if nan_guard:
            # Grads are identical on every shard (pmean'd loss), so the
            # guard decision is globally consistent without a collective.
            finite = jnp.all(jnp.stack([
                jnp.all(jnp.isfinite(g))
                for g in jax.tree_util.tree_leaves(grads)
            ]))
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old),
                new_params, params)
            new_opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old),
                new_opt_state, opt_state)
            if isinstance(aux, dict):
                aux = dict(aux, grads_finite=finite)
        return new_params, new_opt_state, step + 1, loss, aux

    @partial(jax.jit, donate_argnums=(0,))
    def step_jit(state: TrainState, *batch):
        batch_specs = tuple(
            jax.tree_util.tree_map(
                lambda x: P(axis, *([None] * (jnp.ndim(x) - 1))), b
            )
            for b in batch
        )
        mapped = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), P()) + batch_specs,
            out_specs=(P(), P(), P(), P(), P()),
        )
        params, opt_state, stepc, loss, aux = mapped(
            state.params, state.opt_state, state.step, *batch
        )
        return TrainState(params, opt_state, stepc), loss, aux

    return step_jit


def make_dp_eval_step(
    eval_fn: Callable,
    mesh: Mesh,
    axis: str = AXIS,
):
    """Data-parallel evaluation: ``eval_fn(params, *batch_shard)`` returns
    a pytree of per-shard means; outputs are pmean'd to global means."""

    def shard_fn(params, *batch):
        out = eval_fn(params, *batch)
        return jax.tree_util.tree_map(lambda a: lax.pmean(a, axis), out)

    @jax.jit
    def eval_jit(params, *batch):
        batch_specs = tuple(
            jax.tree_util.tree_map(
                lambda x: P(axis, *([None] * (jnp.ndim(x) - 1))), b
            )
            for b in batch
        )
        mapped = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(),) + batch_specs,
            out_specs=P(),
        )
        return mapped(params, *batch)

    return eval_jit
