"""Fixed-capacity packing of fragment pairs for the on-device pipeline.

The reference stacks the two clouds of a pair into one variable-length
tensor inside the collate (reference: datasets/dataloader.py:75-85); here
the host packs them into the static layout every jitted program expects:

  rows [0, n0)        cloud 0 (source)
  rows [n0, n0+n1)    cloud 1 (target)
  rows [n0+n1, C0)    shadow padding (+1e6 coordinates, zero features)

Correspondences are padded to a static capacity with a validity mask, and
the anchor/positive spatial-distance matrix (reference:
datasets/ThreeDMatch.py:137) is padded with a large constant so padded
pairs never enter the safe-radius negative mask.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import numpy as np

from d3feat_tpu.ops.subsample import SHADOW_COORD

_FAR = 1.0e4  # padding value for dist_keypts: always outside safe_radius


class PackedPair(NamedTuple):
    points: np.ndarray      # [C0, 3] float32 stacked + shadow-padded
    features: np.ndarray    # [C0, F] float32, zero padding
    lengths: np.ndarray     # [2] int32
    corr: np.ndarray        # [M, 2] int32 (anchor idx in cloud0, positive in cloud1)
    corr_valid: np.ndarray  # [M] bool
    dist_keypts: np.ndarray  # [M, M] float32


def pack_pair(
    pts0: np.ndarray,
    pts1: np.ndarray,
    feat0: np.ndarray,
    feat1: np.ndarray,
    corr: Optional[np.ndarray],
    dist_keypts: Optional[np.ndarray],
    *,
    point_capacity: int,
    corr_capacity: int,
) -> PackedPair:
    n0, n1 = len(pts0), len(pts1)
    if n0 + n1 > point_capacity:
        raise ValueError(
            f"pair has {n0}+{n1} points > capacity {point_capacity}; "
            "downsample more or use a larger bucket"
        )
    fdim = feat0.shape[1]
    points = np.full((point_capacity, 3), SHADOW_COORD, np.float32)
    feats = np.zeros((point_capacity, fdim), np.float32)
    points[:n0] = pts0
    points[n0 : n0 + n1] = pts1
    feats[:n0] = feat0
    feats[n0 : n0 + n1] = feat1

    m = corr_capacity
    corr_out = np.zeros((m, 2), np.int32)
    corr_valid = np.zeros((m,), bool)
    dk_out = np.full((m, m), _FAR, np.float32)
    if corr is not None and len(corr) > 0:
        k = min(len(corr), m)
        corr_out[:k] = corr[:k]
        corr_valid[:k] = True
        if dist_keypts is not None:
            dk_out[:k, :k] = dist_keypts[:k, :k]

    return PackedPair(
        points=points,
        features=feats,
        lengths=np.array([n0, n1], np.int32),
        corr=corr_out,
        corr_valid=corr_valid,
        dist_keypts=dk_out,
    )


def pack_single(
    pts: np.ndarray, feat: np.ndarray, *, point_capacity: int
) -> Dict[str, np.ndarray]:
    """Single-cloud packing for feature extraction (eval path).

    Unlike the reference test path — which stacks the fragment with itself
    and throws half the compute away (reference: datasets/ThreeDMatch.py:200-203)
    — extraction here runs on the single cloud (second length 0).
    """
    n = len(pts)
    if n > point_capacity:
        raise ValueError(f"cloud has {n} points > capacity {point_capacity}")
    points = np.full((point_capacity, 3), SHADOW_COORD, np.float32)
    feats = np.zeros((point_capacity, feat.shape[1]), np.float32)
    points[:n] = pts
    feats[:n] = feat
    return {
        "points": points,
        "features": feats,
        "lengths": np.array([n, 0], np.int32),
    }


def pack_fragments(
    clouds, *, point_capacity: int, num_clouds: int
) -> Dict[str, np.ndarray]:
    """Pack up to ``num_clouds`` independent fragments into one stacked
    batch (fragments ride the cloud axis: the whole pipeline is
    num_clouds-generic, so B fragments extract in one jitted program).
    Unused cloud slots get length 0.
    """
    if len(clouds) > num_clouds:
        raise ValueError(f"{len(clouds)} fragments > num_clouds {num_clouds}")
    total = sum(len(c) for c in clouds)
    if total > point_capacity:
        raise ValueError(f"{total} points > capacity {point_capacity}")
    points = np.full((point_capacity, 3), SHADOW_COORD, np.float32)
    feats = np.zeros((point_capacity, 1), np.float32)
    lengths = np.zeros((num_clouds,), np.int32)
    row = 0
    for i, c in enumerate(clouds):
        n = len(c)
        points[row : row + n] = c
        feats[row : row + n] = 1.0
        lengths[i] = n
        row += n
    return {"points": points, "features": feats, "lengths": lengths}


def choose_bucket(n_points: int, buckets) -> int:
    """Smallest bucket capacity >= n_points (recompilation-bounded padding)."""
    for b in sorted(buckets):
        if n_points <= b:
            return int(b)
    raise ValueError(f"{n_points} points exceed the largest bucket {max(buckets)}")
