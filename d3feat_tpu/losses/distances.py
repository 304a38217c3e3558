"""Pairwise distance matrices (symbolic cdist).

Counterpart of the reference's cdist (reference: utils/loss.py:8-44) with
the same metrics and epsilons: 'euclidean' (sqrt + 1e-12 fudge),
'sqeuclidean', 'cityblock', 'cosine' (sqrt(2 - 2 a.b), unit-norm inputs),
'arccosine'.
"""

from __future__ import annotations

import jax.numpy as jnp


def cdist(a: jnp.ndarray, b: jnp.ndarray, metric: str = "euclidean") -> jnp.ndarray:
    """[B1, B2] pairwise distances between rows of a and b."""
    if metric == "cosine":
        return jnp.sqrt(jnp.maximum(2.0 - 2.0 * (a @ b.T), 0.0))
    if metric == "arccosine":
        return jnp.arccos(jnp.clip(a @ b.T, -1.0, 1.0))
    diffs = a[:, None, :] - b[None, :, :]
    if metric == "sqeuclidean":
        return jnp.sum(diffs**2, axis=-1)
    if metric == "euclidean":
        return jnp.sqrt(jnp.sum(diffs**2, axis=-1) + 1e-12)
    if metric == "cityblock":
        return jnp.sum(jnp.abs(diffs), axis=-1)
    raise NotImplementedError(f"cdist metric {metric!r} not implemented")
