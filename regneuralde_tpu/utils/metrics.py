"""Dataset-sweep metrics (reference: src/metrics.jl)."""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np


def accuracy(apply_fn: Callable, params, loader, batches: Optional[int] = None,
             **kwargs) -> float:
    """Percent top-1 accuracy over a loader of ``(x, y_onehot)`` batches.

    ``apply_fn(params, x, **kwargs)`` must return logits (or an output
    object whose first field is logits). Reference: src/metrics.jl:4-18.
    """
    total_correct = 0
    total = 0
    for i, (x, y) in enumerate(loader):
        if batches is not None and i >= batches:
            break
        out = apply_fn(params, jnp.asarray(x), **kwargs)
        logits = out[0] if isinstance(out, tuple) or hasattr(out, "_fields") else out
        pred = np.asarray(jnp.argmax(logits, axis=-1))
        target = np.asarray(y).argmax(axis=-1)
        total_correct += int((pred == target).sum())
        total += target.shape[0]
    return 100.0 * total_correct / max(total, 1)


def loglikelihood(apply_fn: Callable, params, loader,
                  batches: Optional[int] = None, **kwargs) -> float:
    """Mean per-sample log-likelihood over a loader of ``x`` batches.

    ``apply_fn(params, x, **kwargs)`` must return logpx (or an output
    object whose first field is logpx). Reference: src/metrics.jl:20-33.
    """
    total_ll = 0.0
    total = 0
    for i, x in enumerate(loader):
        if batches is not None and i >= batches:
            break
        out = apply_fn(params, jnp.asarray(x), **kwargs)
        logpx = out[0] if isinstance(out, tuple) or hasattr(out, "_fields") else out
        total_ll += float(jnp.sum(logpx))
        total += x.shape[0]
    return total_ll / max(total, 1)
