"""Optimizer chains matching the reference experiments' Flux optimisers.

Flux applies chained optimisers to the gradient left-to-right
(``Optimiser(InvDecay(γ), Momentum(η, ρ))`` first scales the gradient by
``1/(1 + γ n)``, then applies momentum); the optax chains below preserve
that order. Reference uses:

  * MNIST NODE:   InvDecay(1e-5) + Momentum(0.1, 0.9)   (mnist_node.jl:130)
  * Latent ODE:   InvDecay(1e-5) + AdaMax(0.01)         (latent_ode.jl:108)
  * MNIST NSDE:   InvDecay(1e-5) + ADAM(0.01)           (mnist_nsde.jl:87)
  * FFJORD:       WeightDecay(1e-5) + ADAM(1e-2 / 4e-2) (ffjord_tabular.jl:133)
  * Toy SDE:      AdaBelief(0.01)                       (sde_toy_problem.jl:65)
"""

from __future__ import annotations

import optax


def inv_decay(gamma: float) -> optax.GradientTransformation:
    """Flux ``InvDecay``: multiply the update by ``1 / (1 + gamma * n)``
    where n counts optimizer steps."""
    return optax.scale_by_schedule(lambda step: 1.0 / (1.0 + gamma * step))


def momentum_sgd(lr: float, rho: float) -> optax.GradientTransformation:
    """Flux ``Momentum(lr, rho)``: v = rho*v + lr*g; p -= v."""
    return optax.chain(optax.scale(lr), optax.trace(decay=rho), optax.scale(-1.0))


_REGISTRY = {
    "momentum": lambda lr, **kw: momentum_sgd(lr, kw.get("rho", 0.9)),
    "adam": lambda lr, **kw: optax.adam(lr),
    "adamax": lambda lr, **kw: optax.adamax(lr),
    "adabelief": lambda lr, **kw: optax.adabelief(lr),
    "sgd": lambda lr, **kw: optax.sgd(lr),
}


def make_optimizer(
    name: str,
    lr: float,
    inv_decay_gamma: float | None = None,
    weight_decay: float | None = None,
    **kwargs,
) -> optax.GradientTransformation:
    """Build a reference-style optimizer chain by name."""
    try:
        core = _REGISTRY[name.lower()](lr, **kwargs)
    except KeyError:
        raise ValueError(
            f"unknown optimizer {name!r}; available: {sorted(_REGISTRY)}"
        ) from None
    pre = []
    if weight_decay is not None:
        pre.append(optax.add_decayed_weights(weight_decay))
    if inv_decay_gamma is not None:
        pre.append(inv_decay(inv_decay_gamma))
    return optax.chain(*pre, core) if pre else core


def mnist_node_optimizer() -> optax.GradientTransformation:
    return make_optimizer("momentum", 0.1, inv_decay_gamma=1e-5, rho=0.9)


def latent_ode_optimizer() -> optax.GradientTransformation:
    return make_optimizer("adamax", 0.01, inv_decay_gamma=1e-5)


def mnist_nsde_optimizer() -> optax.GradientTransformation:
    return make_optimizer("adam", 0.01, inv_decay_gamma=1e-5)


def ffjord_optimizer(lr: float = 1e-2) -> optax.GradientTransformation:
    return make_optimizer("adam", lr, weight_decay=1e-5)


def sde_toy_optimizer() -> optax.GradientTransformation:
    return make_optimizer("adabelief", 0.01)
