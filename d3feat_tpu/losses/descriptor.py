"""Descriptor metric losses over correspondence pairs, masked for padding.

Counterparts of the reference losses (reference: utils/loss.py:47-141):

* :func:`circle_loss` — the default (config.py:51): per-row/column weighted
  log-sum-exp of positive and negative pair distances at margins
  pos_margin/neg_margin with detached linear weighting and a safe-radius
  spatial negative mask (loss.py:100-141).
* :func:`contrastive_loss` — batch-hard hinge loss (arXiv:1703.07737):
  furthest positive vs. closest negative per row, with +10 added to the
  descriptor distance of spatially-close off-diagonal pairs so they are
  never picked as negatives (loss.py:47-97).

Unlike the reference (variable correspondence count n <= num_node), inputs
here are padded to a static capacity M with a validity mask; every reduction
(max/min/logsumexp/mean) is masked so results equal the reference's on the
valid n x n sub-block exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from d3feat_tpu.losses.distances import cdist

_BIG = 1.0e5
_NEG_INF = -1.0e9


class DescLossResult(NamedTuple):
    loss: jax.Array        # scalar
    accuracy: jax.Array    # scalar, percent of rows where d_pos < d_neg
    d_pos: jax.Array       # scalar mean furthest-positive distance
    d_neg: jax.Array       # scalar mean average-negative distance
    dists: jax.Array       # [M, M] descriptor distance matrix (for det loss)


def _masked_stats(dists, valid):
    """furthest_positive, closest_negative, average_negative, accuracy
    over the valid sub-block (reference: loss.py:86-95,119-123)."""
    m = dists.shape[0]
    eye = jnp.eye(m, dtype=bool)
    vpair = valid[:, None] & valid[None, :]

    pos_mask = eye & vpair
    furthest_positive = jnp.max(jnp.where(pos_mask, dists, 0.0), axis=1)
    neg_ok = vpair & ~eye
    closest_negative = jnp.min(jnp.where(neg_ok, dists, _BIG), axis=1)

    n = jnp.maximum(jnp.sum(valid), 1).astype(dists.dtype)
    row_sum = jnp.sum(jnp.where(vpair, dists, 0.0), axis=1)
    average_negative = (row_sum - furthest_positive) / jnp.maximum(n - 1.0, 1.0)

    diff = furthest_positive - closest_negative
    accuracy = jnp.sum((diff < 0) & valid) * 100.0 / n
    return furthest_positive, closest_negative, average_negative, accuracy, n


def circle_loss(
    anchor: jax.Array,
    positive: jax.Array,
    dist_keypts: jax.Array,
    valid: jax.Array,
    *,
    dist_type: str = "euclidean",
    log_scale: float = 10.0,
    safe_radius: float = 0.10,
    pos_margin: float = 0.1,
    neg_margin: float = 1.4,
) -> DescLossResult:
    """Circle loss over a padded correspondence batch.

    Args:
      anchor / positive: [M, D] descriptors (row i of each is a true pair).
      dist_keypts: [M, M] spatial distances between anchor keypoints.
      valid: [M] bool, True for real correspondences.
    """
    dists = cdist(anchor, positive, metric=dist_type)
    m = dists.shape[0]
    eye = jnp.eye(m, dtype=bool)
    vpair = valid[:, None] & valid[None, :]

    fp, cn, avg_neg, accuracy, n = _masked_stats(dists, valid)

    neg_mask = (dist_keypts > safe_radius) & vpair  # (loss.py:116)

    # The reference suppresses the opposite class by shifting distances by
    # +-1e5, which zeroes the detached weight; the shifted entries then still
    # contribute exp(0) = 1 to the logsumexp (loss.py:125-135). Reproduce
    # that exactly on the valid block, and exclude only padding (-> exp 0).
    pos = dists - _BIG * neg_mask.astype(dists.dtype)
    pos_weight = jax.lax.stop_gradient(jnp.maximum(pos - pos_margin, 0.0))
    pos_arg = jnp.where(
        vpair, log_scale * (pos - pos_margin) * pos_weight, _NEG_INF
    )
    lse_pos_row = jax.nn.logsumexp(pos_arg, axis=-1)
    lse_pos_col = jax.nn.logsumexp(pos_arg, axis=-2)

    neg = dists + _BIG * (~neg_mask).astype(dists.dtype)
    neg_weight = jax.lax.stop_gradient(jnp.maximum(neg_margin - neg, 0.0))
    neg_arg = jnp.where(
        vpair, log_scale * (neg_margin - neg) * neg_weight, _NEG_INF
    )
    lse_neg_row = jax.nn.logsumexp(neg_arg, axis=-1)
    lse_neg_col = jax.nn.logsumexp(neg_arg, axis=-2)

    loss_row = jax.nn.softplus(lse_pos_row + lse_neg_row) / log_scale
    loss_col = jax.nn.softplus(lse_pos_col + lse_neg_col) / log_scale
    per_row = jnp.where(valid, loss_row + loss_col, 0.0)
    loss = jnp.sum(per_row) / n

    d_pos = jnp.sum(jnp.where(valid, fp, 0.0)) / n
    d_neg = jnp.sum(jnp.where(valid, avg_neg, 0.0)) / n
    return DescLossResult(loss, accuracy, d_pos, d_neg, dists)


def contrastive_loss(
    anchor: jax.Array,
    positive: jax.Array,
    dist_keypts: jax.Array,
    valid: jax.Array,
    *,
    metric: str = "euclidean",
    pos_margin: float = 0.1,
    neg_margin: float = 1.4,
    safe_radius: float = 0.25,
) -> DescLossResult:
    """Batch-hard contrastive loss over a padded correspondence batch."""
    dists = cdist(anchor, positive, metric=metric)
    m = dists.shape[0]
    eye = jnp.eye(m, dtype=bool)
    vpair = valid[:, None] & valid[None, :]

    # +10 on spatially-close off-diagonal pairs so they are never negatives
    # (loss.py:58-61; the diagonal is exempted via the +10*eye trick there).
    close = (dist_keypts + 10.0 * eye) < safe_radius
    dists = dists + jnp.where(close & vpair, 10.0, 0.0)

    fp, cn, avg_neg, accuracy, n = _masked_stats(dists, valid)

    per_row = jnp.maximum(fp - pos_margin, 0.0) + jnp.maximum(neg_margin - cn, 0.0)
    loss = jnp.sum(jnp.where(valid, per_row, 0.0)) / n

    d_pos = jnp.sum(jnp.where(valid, fp, 0.0)) / n
    d_neg = jnp.sum(jnp.where(valid, avg_neg, 0.0)) / n
    return DescLossResult(loss, accuracy, d_pos, d_neg, dists)
