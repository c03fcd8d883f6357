"""Tensor parallelism for the dynamics MLP, composable with data parallelism.

The reference has no parallelism at all (SURVEY §2.3); batch data
parallelism is this framework's primary scaling axis. For completeness the
dynamics network itself can also be tensor-parallel: the hidden dimension
of the time-dependent 2-layer MLP shards over a ``model`` mesh axis —
column-parallel first layer, row-parallel second layer, one ``psum`` over
the model axis per dynamics evaluation (Megatron-style). Combined with the
``data`` axis this gives a genuine 2-D (dp x tp) mesh for the solver loop:
error norms psum over ``data`` (globally synchronized step control), layer
contractions psum over ``model``.

For the tiny reference models this is a capability demonstration (the
hidden dim is 100); the structure is what scales.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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


def shard_tp_params(mesh: Mesh, parts: TPMLPParams,
                    model_axis: str = "model") -> TPMLPParams:
    specs = tp_param_specs(model_axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), parts, specs
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
