"""Batched full-covariance Gaussian (reference: src/utils.jl:89-145)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


class BatchedMultiVariateNormal:
    """Density and sampling for a single MvNormal over a batch of points.

    Precomputes the inverse, determinant, and Cholesky factor at
    construction, as the reference does (src/utils.jl:101-113). Points are
    batch-major (B, k).
    """

    def __init__(self, mu, cov):
        mu = jnp.asarray(mu, jnp.float32)
        cov = jnp.asarray(cov, jnp.float32)
        self.mu = mu.reshape(1, -1)
        self.cov = cov
        self.inv_cov = jnp.linalg.inv(cov)
        self.det_cov = jnp.linalg.det(cov)
        self.chol = jnp.linalg.cholesky(cov)
        self.k = mu.shape[-1]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Density at each row of x (reference: src/utils.jl:115-119)."""
        denom = jnp.sqrt((2 * math.pi) ** self.k * self.det_cov)
        diff = x - self.mu  # (B, k)
        quad = jnp.einsum("bi,ij,bj->b", diff, self.inv_cov, diff)
        return jnp.exp(-quad / 2.0) / denom

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        diff = x - self.mu
        quad = jnp.einsum("bi,ij,bj->b", diff, self.inv_cov, diff)
        return -quad / 2.0 - 0.5 * (
            self.k * math.log(2 * math.pi) + jnp.log(self.det_cov)
        )

    def sample(self, key: jax.Array, nsamples: int) -> jnp.ndarray:
        """mu + L @ eps (reference: src/utils.jl:121-145)."""
        eps = jax.random.normal(key, (nsamples, self.k))
        return self.mu + eps @ self.chol.T
