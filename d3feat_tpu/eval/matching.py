"""Descriptor matching: keypoint selection + mutual nearest neighbors.

Counterpart of the reference matching path (reference:
geometric_registration/common.py:5-21 ``build_correspondence``;
test.py:52-57 keypoint selection). The mutual-NN search is a single
descriptor matmul — on TPU it runs as one jitted program over the static
keypoint budget; a numpy variant serves host-side tooling.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def select_keypoints(
    scores: np.ndarray, num_points: int, *, random: bool = False,
    rng: np.random.Generator | None = None, on_short: str = "warn",
) -> np.ndarray:
    """Indices of the ``num_points`` top-score keypoints (or random ones)
    (reference: test.py:52-57 — argsort tail, ascending order).

    Guard: fewer than ``num_points`` strictly-positive scores means the
    top-k is padded with arbitrary zero-score (undetected) points — and,
    when the scores came through ``config.eval_gate_topm``, it is exactly
    the condition under which the gate's top-k-exactness argument no
    longer holds (gating only zeroes, so per fragment the positive-score
    count == detected-candidates-inside-top-M; exact top-k requires that
    count >= k; see models/kpfcnn.detection_scores). ``on_short``:
    'warn' (default) | 'raise' | 'ignore'.
    """
    scores = np.asarray(scores).squeeze()
    if random:
        rng = rng or np.random.default_rng()
        return rng.choice(len(scores), num_points)
    if on_short != "ignore":
        detected = int(np.sum(scores > 0.0))
        if detected < num_points:
            msg = (
                f"only {detected} positive-score keypoints for a top-"
                f"{num_points} selection: the tail is arbitrary zero-score "
                f"points (and eval_gate_topm exactness is void for this "
                f"fragment — raise the gate's M or disable it)."
            )
            if on_short == "raise":
                raise RuntimeError(msg)
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return np.argsort(scores)[-num_points:]


def mutual_nn_numpy(source_desc: np.ndarray,
                    target_desc: np.ndarray) -> np.ndarray:
    """[M, 2] mutual-NN pairs in descriptor space (host numpy).

    Distance = sqrt(2 - 2 S.T^T), valid for L2-normalized descriptors
    (reference: common.py:12).
    """
    sim = source_desc @ target_desc.T
    d2 = np.maximum(2.0 - 2.0 * sim, 0.0)
    s_nn = np.argmin(d2, axis=1)
    t_nn = np.argmin(d2, axis=0)
    src = np.arange(len(source_desc))
    mutual = t_nn[s_nn] == src
    return np.stack([src[mutual], s_nn[mutual]], axis=1)


@functools.partial(jax.jit)
def mutual_nn_matrix(source_desc: jax.Array, target_desc: jax.Array
                     ) -> Tuple[jax.Array, jax.Array]:
    """Static-shape mutual-NN: ([Ns] target index, [Ns] bool mutual mask).

    Keeps every source row (no dynamic compaction) so the whole matching
    step stays jittable; hosts compact with the mask.
    """
    sim = source_desc @ target_desc.T  # [Ns, Nt]
    s_nn = jnp.argmax(sim, axis=1)
    t_nn = jnp.argmax(sim, axis=0)
    src = jnp.arange(source_desc.shape[0])
    mutual = t_nn[s_nn] == src
    return s_nn, mutual


def mutual_nn(source_desc, target_desc) -> np.ndarray:
    """Device mutual-NN with host compaction; same result as
    :func:`mutual_nn_numpy` (up to argmin tie-breaking)."""
    s_nn, mutual = mutual_nn_matrix(
        jnp.asarray(source_desc), jnp.asarray(target_desc)
    )
    s_nn, mutual = np.asarray(s_nn), np.asarray(mutual)
    src = np.arange(len(s_nn))
    return np.stack([src[mutual], s_nn[mutual]], axis=1)


def inlier_stats(
    source_keypts: np.ndarray,
    target_keypts: np.ndarray,
    corr: np.ndarray,
    gt_trans: np.ndarray,
    distance_threshold: float,
) -> Tuple[int, float]:
    """(num_inliers, inlier_ratio) after moving target keypoints by the GT
    pose (reference: test.py:65-72)."""
    if len(corr) == 0:
        return 0, 0.0
    frag1 = source_keypts[corr[:, 0]]
    t = target_keypts[corr[:, 1]]
    frag2 = t @ gt_trans[:3, :3].T + gt_trans[:3, 3]
    dist = np.linalg.norm(frag1 - frag2, axis=1)
    num_inliers = int(np.sum(dist < distance_threshold))
    return num_inliers, num_inliers / len(dist)
