"""Dynamics networks and small building blocks (flax.linen modules).

TPU-first equivalents of the reference's Flux modules:

* ``TDChain`` / ``MLPDynamics`` — time-dependent MLPs that concatenate the
  scalar solve time ``t`` (broadcast to a row) onto the input of every
  layer (reference: src/models/basic.jl:16-28 and the MNIST dynamics at
  experiments/mnist_node.jl:41-54).
* ``ConcatSquashLinear`` / ``CSLDynamics`` — the gated FFJORD dynamics
  (reference: experiments/ffjord_tabular.jl:48-106), including an analytic
  vector-Jacobian product used by the Hutchinson trace estimator.
* ``RecognitionRNN`` — Elman encoder for latent-ODE style models
  (reference: src/models/basic.jl:43-58).
* ``LatentGRU`` — the masked GRU-Bayes cell run backwards in time over
  irregular observations (reference: experiments/latent_ode.jl:39-99),
  implemented as an ``nn.scan`` over a cell module.

Array convention: JAX-native batch-major ``(batch, features)`` (the
reference is Julia column-major ``(features, batch)`` — transposed, same
math). Time-major sequences are ``(batch, time, features)``.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _t_row(x: jnp.ndarray, t) -> jnp.ndarray:
    """Broadcast time to a (batch, 1) column for concatenation.

    The reference builds this with ``CUDA.ones(1, B) .* t`` to stay
    on-device and on-tape (src/models/basic.jl:25-28); in JAX broadcasting
    a traced scalar does both for free. A ``(batch,)`` time vector (the
    per-lane-controller engine advances every sample at its OWN t) maps
    to one column entry per row.
    """
    t = jnp.asarray(t, x.dtype)
    if t.ndim == 1:
        return t[:, None]
    return jnp.broadcast_to(t, (x.shape[0], 1))


class TDChain(nn.Module):
    """Chain of Dense layers, each consuming ``concat([h, t])``.

    Reference: src/models/basic.jl:16-28 (``applytdchain``).
    """

    features: Sequence[int]
    activation: Callable = jnp.tanh
    final_activation: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, t) -> jnp.ndarray:
        h = x
        for i, f in enumerate(self.features):
            h = nn.Dense(f, name=f"dense_{i}")(jnp.concatenate([h, _t_row(h, t)], -1))
            if i < len(self.features) - 1 or self.final_activation:
                h = self.activation(h)
        return h


class MLPDynamics(nn.Module):
    """The MNIST Neural-ODE dynamics: 784 -> (+t) 100 tanh -> (+t) 784 tanh.

    Reference: experiments/mnist_node.jl:41-54. Uses ``ops.math.tanh``:
    TPU's native tanh approximation (~4e-5 abs error) would floor the
    solver's embedded error estimate at tight tolerances.
    """

    dim: int = 784
    hidden: int = 100

    @nn.compact
    def __call__(self, x: jnp.ndarray, t) -> jnp.ndarray:
        from regneuralde_tpu.ops.math import tanh

        h = tanh(nn.Dense(self.hidden, name="dense_1")(
            jnp.concatenate([x, _t_row(x, t)], -1)))
        return tanh(nn.Dense(self.dim, name="dense_2")(
            jnp.concatenate([h, _t_row(h, t)], -1)))


class MLP(nn.Module):
    """Plain Dense chain (no time input); used for drift/diffusion nets and
    encoders/decoders. ``activations`` applies between layers; the output
    layer is linear unless ``final_activation`` is set."""

    features: Sequence[int]
    activation: Callable = jnp.tanh
    final_activation: Callable = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        for i, f in enumerate(self.features):
            h = nn.Dense(f, name=f"dense_{i}")(h)
            if i < len(self.features) - 1:
                h = self.activation(h)
        if self.final_activation is not None:
            h = self.final_activation(h)
        return h


class AlternatingMLP(nn.Module):
    """tanh -> (Dense(d,h) tanh -> Dense(h,d) tanh) * depth.

    The latent-ODE generative dynamics (reference:
    experiments/latent_ode.jl:113-126): an initial pointwise ``tanh`` then
    eight alternating Dense(20<->50, tanh) layers.
    """

    dim: int = 20
    hidden: int = 50
    depth: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = jnp.tanh(x)
        for i in range(self.depth):
            h = jnp.tanh(nn.Dense(self.hidden, name=f"up_{i}")(h))
            h = jnp.tanh(nn.Dense(self.dim, name=f"down_{i}")(h))
        return h


class ConcatSquashLinear(nn.Module):
    """``(W x + b) * sigmoid(w_g t) + (w_b t + b_b)`` — FFJORD's CSL layer.

    Reference: experiments/ffjord_tabular.jl:48-76.
    """

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, t) -> jnp.ndarray:
        lin = nn.Dense(self.features, name="layer")(x)
        t_arr = jnp.reshape(jnp.asarray(t, x.dtype), (1, 1))
        gate = jax.nn.sigmoid(nn.Dense(self.features, use_bias=False, name="gate")(t_arr))
        bias = nn.Dense(self.features, name="bias")(t_arr)
        return lin * gate + bias


class CSLDynamics(nn.Module):
    """Three CSL layers with softplus activations — the FFJORD dynamics for
    the gaussian/tabular experiments (reference:
    experiments/ffjord_tabular.jl:78-106, ffjord_gaussian.jl:48-106).

    ``vjp`` computes the analytic e^T J product the reference hand-derives
    (ffjord_tabular.jl:97-106); it is also recoverable with ``jax.vjp``,
    but the closed form avoids a nested AD trace inside the solver loop.
    """

    dim: int
    hidden: int = 100

    def setup(self):
        self.csl1 = ConcatSquashLinear(self.hidden)
        self.csl2 = ConcatSquashLinear(self.hidden)
        self.csl3 = ConcatSquashLinear(self.dim)

    def __call__(self, x: jnp.ndarray, t) -> jnp.ndarray:
        h = jax.nn.softplus(self.csl1(x, t))
        h = jax.nn.softplus(self.csl2(h, t))
        return self.csl3(h, t)

    def forw_n_back(self, x: jnp.ndarray, t, e: jnp.ndarray):
        """Forward value and analytic ``e^T J`` in one pass.

        Returns ``(f(x,t), eJ)`` with ``eJ`` shaped like ``x``. Uses the
        chain of per-layer transposed-Jacobian products; the gate factors
        are diagonal so each backward hop is ``(W * gate)^T @ v`` with the
        softplus derivative ``sigmoid(z)`` applied between hops.
        """

        def layer_fwd(csl: ConcatSquashLinear, h, t_arr):
            variables = csl.variables
            W = variables["params"]["layer"]["kernel"]  # (in, out)
            b = variables["params"]["layer"]["bias"]
            Wg = variables["params"]["gate"]["kernel"]  # (1, out)
            Wb = variables["params"]["bias"]["kernel"]
            bb = variables["params"]["bias"]["bias"]
            gate = jax.nn.sigmoid(t_arr * Wg)  # (1, out)
            z = h @ W + b
            out = z * gate + (t_arr * Wb + bb)
            back = lambda v: v @ (W * gate).T  # (batch,out)@(out,in)
            return z, out, back

        t_arr = jnp.reshape(jnp.asarray(t, x.dtype), (1, 1))
        z1, o1, back1 = layer_fwd(self.csl1, x, t_arr)
        h1 = jax.nn.softplus(o1)
        z2, o2, back2 = layer_fwd(self.csl2, h1, t_arr)
        h2 = jax.nn.softplus(o2)
        z3, o3, back3 = layer_fwd(self.csl3, h2, t_arr)

        v = back3(e)
        v = back2(v * jax.nn.sigmoid(o2))
        v = back1(v * jax.nn.sigmoid(o1))
        return o3, v


class _ElmanCell(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, h, x):
        h = jnp.tanh(nn.Dense(self.hidden, name="i2h")(
            jnp.concatenate([x, h], -1)))
        return h, ()


class RecognitionRNN(nn.Module):
    """Elman cell encoder: ``h' = tanh(W [x; h])``, output ``2*latent_dim``.

    Reference: src/models/basic.jl:43-58. ``__call__`` runs the cell over a
    (batch, time, feat) sequence *backwards* (latent-ODE encoders consume
    the series in reverse) via ``nn.scan`` and returns the final output.
    """

    latent_dim: int
    hidden: int

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        batch = xs.shape[0]
        h0 = jnp.zeros((batch, self.hidden), xs.dtype)
        xs_rev = jnp.flip(jnp.swapaxes(xs, 0, 1), axis=0)  # (time, batch, feat)
        scan = nn.scan(
            _ElmanCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        h_final, _ = scan(self.hidden, name="cell")(h0, xs_rev)
        return nn.Dense(2 * self.latent_dim, name="h2o")(h_final)


class _LatentGRUCell(nn.Module):
    in_dim: int
    hidden: int
    latent_dim: int

    @nn.compact
    def __call__(self, carry, x):
        y_mean, y_std = carry
        update_gate = MLP([self.hidden, self.latent_dim],
                          activation=jnp.tanh,
                          final_activation=jax.nn.sigmoid, name="update_gate")
        reset_gate = MLP([self.hidden, self.latent_dim],
                         activation=jnp.tanh,
                         final_activation=jax.nn.sigmoid, name="reset_gate")
        new_state = MLP([self.hidden, 2 * self.latent_dim],
                        activation=jnp.tanh, name="new_state")

        y_concat = jnp.concatenate([y_mean, y_std, x], -1)
        u = update_gate(y_concat)
        r = reset_gate(y_concat)
        concat = jnp.concatenate([y_mean * r, y_std * r, x], -1)
        ns = new_state(concat)
        n_mean = ns[:, : self.latent_dim]
        n_std = ns[:, self.latent_dim :]  # treated as log sigma^2
        ym = (1 - u) * n_mean + u * y_mean
        ys = (1 - u) * n_std + u * y_std
        # Observation mask: rows of x beyond the data block (the mask
        # block); unobserved steps freeze the state.
        mask = (
            jnp.sum(x[:, self.in_dim : 2 * self.in_dim], axis=-1, keepdims=True)
            > 0
        ).astype(x.dtype)
        ym = mask * ym + (1 - mask) * y_mean
        ys = mask * ys + (1 - mask) * y_std
        return (ym, ys), ()


class LatentGRU(nn.Module):
    """Masked GRU-Bayes cell over irregular series, run backwards in time.

    The input at each step is ``concat([data, mask, delta_t])``; steps whose
    mask rows are all zero leave the state untouched (reference:
    experiments/latent_ode.jl:64-99). Returns ``concat([y_mean, y_std])``
    of shape (batch, 2 * latent_dim).
    """

    in_dim: int
    hidden: int
    latent_dim: int

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        # xs: (batch, time, 2*in_dim + 1)
        batch = xs.shape[0]
        y0 = jnp.zeros((batch, self.latent_dim), xs.dtype)
        xs_rev = jnp.flip(jnp.swapaxes(xs, 0, 1), axis=0)
        scan = nn.scan(
            _LatentGRUCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        (y_mean, y_std), _ = scan(
            self.in_dim, self.hidden, self.latent_dim, name="cell"
        )((y0, y0), xs_rev)
        return jnp.concatenate([y_mean, y_std], -1)
