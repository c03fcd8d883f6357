"""Tensor parallelism for dynamics networks, composable with data
parallelism.

The reference has no parallelism at all (SURVEY §2.3); batch data
parallelism is this framework's primary scaling axis. This module makes
the dynamics network itself tensor-parallel as a *generic* capability over
Dense chains (Megatron-style): consecutive layers are paired —
column-parallel layer (output/hidden dim sharded over the ``model`` mesh
axis) followed by a row-parallel layer (input dim sharded) with ONE
``psum`` over the model axis per pair — so a pair costs one collective
per dynamics evaluation, inside every RK stage of every solver trial
step. Unpaired trailing layers are replicated.

Supported families (each maps to a chain of ``TPLayer``):
  * ``models.basic.MLPDynamics`` — the time-concat 2-layer MNIST dynamics
    (time rows folded as rank-1 updates),
  * ``models.basic.AlternatingMLP`` — the latent-ODE dynamics
    (2*depth alternating layers; every up/down pair shards the hidden 50),
  * ``models.basic.MLP`` — plain Dense chains (NSDE drift/diffusion nets).

Integration: ``make_tp_dynamics(module, flax_params)`` returns
``(tp_params, specs, apply_fn)``; ``apply_fn`` is a plain callable
dynamics accepted directly by ``NeuralODE`` / ``odeint`` and must run
INSIDE ``shard_map`` with the local parameter shards. Combined with the
``data`` axis this gives a genuine 2-D (dp x tp) mesh for the solver
loop: error norms psum over ``data`` (globally synchronized step
control), layer contractions psum over ``model``.

For the tiny reference models this is a capability demonstration (hidden
dims of 50-100); the structure is what scales.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TPLayer(NamedTuple):
    """One Dense layer prepared for Megatron sharding (pytree of arrays;
    the static column/row role lives outside the pytree).

    Column-parallel: ``w`` is (in, out_shard), bias and time-row shard
    with the outputs, no collective. Row-parallel: ``w`` is (in_shard,
    out), the matmul produces a partial sum that must be psum'd;
    bias/time-row are replicated and added AFTER the reduction (once).
    """

    w: jnp.ndarray
    b: jnp.ndarray  # (1, out)
    wt: Optional[jnp.ndarray]  # (1, out) time row for concat-time layers


class TPChain(NamedTuple):
    layers: Tuple  # tuple of TPLayer
    # static activation schedule is carried by the apply_fn closure


def _layer_from_dense(p, time_dep: bool) -> TPLayer:
    k = p["kernel"]
    if time_dep:
        w, wt = k[:-1, :], k[-1:, :]
    else:
        w, wt = k, None
    return TPLayer(w=w, b=p["bias"][None, :], wt=wt)


def _chain_specs(layers, cols, model_axis: str) -> TPChain:
    """PartitionSpecs mirroring a TPChain: column layers shard the output
    dim, row layers (with a column predecessor) the input dim; unpaired
    row layers are fully replicated."""
    specs = []
    prev_col = False
    for l, col in zip(layers, cols):
        if col:
            specs.append(TPLayer(
                w=P(None, model_axis), b=P(None, model_axis),
                wt=None if l.wt is None else P(None, model_axis)))
        elif prev_col:
            specs.append(TPLayer(
                w=P(model_axis, None), b=P(),
                wt=None if l.wt is None else P()))
        else:
            specs.append(TPLayer(
                w=P(), b=P(), wt=None if l.wt is None else P()))
        prev_col = col
    return TPChain(layers=tuple(specs))


def make_tp_dynamics(
    module,
    flax_params,
    model_axis: str = "model",
) -> Tuple[TPChain, TPChain, Callable]:
    """Prepare a dynamics module for tensor parallelism.

    Returns ``(tp_params, specs, apply_fn)``:
      * ``tp_params`` — a TPChain pytree of the module's weights split
        into Megatron column/row pairs (host-side full arrays; shard with
        ``shard_tp_params`` or pass through shard_map in_specs),
      * ``specs`` — matching PartitionSpecs,
      * ``apply_fn(params, y, t)`` — a plain callable dynamics (valid
        ``NeuralODE(dynamics=...)`` input) evaluating the chain on local
        shards inside shard_map.
    """
    from regneuralde_tpu.models.basic import MLP, AlternatingMLP, MLPDynamics
    from regneuralde_tpu.ops.math import tanh as accurate_tanh

    p = flax_params["params"]

    if isinstance(module, MLPDynamics):
        layers = (
            _layer_from_dense(p["dense_1"], True),
            _layer_from_dense(p["dense_2"], True),
        )
        cols = (True, False)
        activations = (accurate_tanh, accurate_tanh)
        pre_act = None
    elif isinstance(module, AlternatingMLP):
        layers = []
        cols = []
        for i in range(module.depth):
            layers.append(_layer_from_dense(p[f"up_{i}"], False))
            layers.append(_layer_from_dense(p[f"down_{i}"], False))
            cols += [True, False]
        layers = tuple(layers)
        cols = tuple(cols)
        activations = (jnp.tanh,) * len(layers)
        pre_act = jnp.tanh
    elif isinstance(module, MLP):
        n = len(module.features)
        layers = tuple(
            _layer_from_dense(p[f"dense_{i}"], False) for i in range(n)
        )
        cols = tuple((i % 2 == 0) and (i + 1 < n) for i in range(n))
        acts = []
        for i in range(n):
            inner = module.activation if i < n - 1 else module.final_activation
            acts.append(inner)
        activations = tuple(acts)
        pre_act = None
    else:
        raise ValueError(
            f"no tensor-parallel mapping for {type(module).__name__}; "
            "supported: MLPDynamics, AlternatingMLP, MLP"
        )

    chain = TPChain(layers=layers)
    specs = _chain_specs(layers, cols, model_axis)

    needs_psum = []
    prev_col = False
    for col in cols:
        needs_psum.append((not col) and prev_col)
        prev_col = col

    def apply_fn(params: TPChain, y, t=None):
        h = jnp.tanh(y) if pre_act is not None else y
        for layer, act, red in zip(params.layers, activations, needs_psum):
            pre = jnp.dot(h, layer.w, preferred_element_type=jnp.float32)
            if red:
                pre = lax.psum(pre, model_axis)
            pre = pre + layer.b
            if layer.wt is not None:
                pre = pre + jnp.asarray(t, pre.dtype) * layer.wt
            h = act(pre) if act is not None else pre
        return h

    return chain, specs, apply_fn


def shard_tp_params(mesh: Mesh, params: TPChain, specs: TPChain) -> TPChain:
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


# ---------------------------------------------------------------------------
# Backwards-compatible MLPDynamics-specific helpers (used by round-1 code
# and kept as the simplest worked example of the generic machinery above)
# ---------------------------------------------------------------------------


class TPMLPParams(NamedTuple):
    """MLPDynamics params split for sharding: time rows separated from the
    input blocks of each concat kernel (models.basic.MLPDynamics layout)."""

    w1x: jnp.ndarray  # (D, H)       cols sharded over model
    w1t: jnp.ndarray  # (1, H)       cols sharded over model
    b1: jnp.ndarray   # (1, H)       sharded over model
    w2h: jnp.ndarray  # (H, D)       rows sharded over model
    w2t: jnp.ndarray  # (1, D)       replicated
    b2: jnp.ndarray   # (1, D)       replicated


def split_mlp_params(flax_params) -> TPMLPParams:
    p = flax_params["params"]
    k1 = p["dense_1"]["kernel"]
    k2 = p["dense_2"]["kernel"]
    return TPMLPParams(
        w1x=k1[:-1, :],
        w1t=k1[-1:, :],
        b1=p["dense_1"]["bias"][None, :],
        w2h=k2[:-1, :],
        w2t=k2[-1:, :],
        b2=p["dense_2"]["bias"][None, :],
    )


def tp_param_specs(model_axis: str = "model") -> TPMLPParams:
    """PartitionSpecs for TPMLPParams over the model axis."""
    return TPMLPParams(
        w1x=P(None, model_axis),
        w1t=P(None, model_axis),
        b1=P(None, model_axis),
        w2h=P(model_axis, None),
        w2t=P(),
        b2=P(),
    )


def tp_mlp_dynamics(t, y, parts: TPMLPParams, model_axis: str = "model"):
    """Tensor-parallel evaluation of the time-dependent MLP dynamics.

    To be called INSIDE shard_map with ``parts`` holding local shards:
    column-parallel layer 1 (local hidden slice), row-parallel layer 2 with
    one psum over the model axis, bias/time-row of layer 2 added once after
    the reduction.
    """
    from regneuralde_tpu.ops.math import tanh

    t = jnp.asarray(t, y.dtype)
    h = tanh(
        jnp.dot(y, parts.w1x, preferred_element_type=jnp.float32)
        + t * parts.w1t
        + parts.b1
    )
    partial = jnp.dot(h, parts.w2h, preferred_element_type=jnp.float32)
    out = lax.psum(partial, model_axis) + t * parts.w2t + parts.b2
    return tanh(out)
