"""Self-supervised detector loss.

Counterpart of the reference DetLoss (reference: utils/loss.py:144-158):
    mean over correspondences of
      (furthest_positive - closest_negative) * (anc_score + pos_score)
so scores learn to be high exactly where the descriptors already
discriminate (negative gap) and low otherwise. Masked for padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def det_loss(
    dists: jax.Array,
    anc_score: jax.Array,
    pos_score: jax.Array,
    valid: jax.Array,
) -> jax.Array:
    """Args:
      dists: [M, M] descriptor distance matrix from the descriptor loss.
      anc_score / pos_score: [M, 1] detection scores at the correspondences.
      valid: [M] bool padding mask.
    """
    m = dists.shape[0]
    eye = jnp.eye(m, dtype=bool)
    vpair = valid[:, None] & valid[None, :]

    furthest_positive = jnp.max(jnp.where(eye & vpair, dists, 0.0), axis=1)
    closest_negative = jnp.min(jnp.where(vpair & ~eye, dists, 1.0e5), axis=1)

    gap = furthest_positive - closest_negative
    per_row = gap * (anc_score[:, 0] + pos_score[:, 0])
    n = jnp.maximum(jnp.sum(valid), 1).astype(dists.dtype)
    return jnp.sum(jnp.where(valid, per_row, 0.0)) / n
