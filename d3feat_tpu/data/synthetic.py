"""Synthetic fragment-pair generation for tests and benchmarks.

Produces 2.5D surface-scan-like clouds (what 3DMatch fragments look like
after 0.03 m voxel downsampling) with exact ground-truth correspondences,
so the full train/eval stack can be exercised hermetically without the
3DMatch download.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from d3feat_tpu.data.augment import augment_pair


def synthetic_fragment(
    rng: np.random.Generator, n_points: int, extent: float = 3.0,
    noise: float = 0.005,
) -> np.ndarray:
    """[N, 3] wavy 2.5D surface patch sampled uniformly in x-y."""
    xy = rng.uniform(0.0, extent, size=(n_points, 2))
    z = (
        0.3 * np.sin(xy[:, 0] * 2.1)
        + 0.2 * np.cos(xy[:, 1] * 3.3)
        + 0.1 * np.sin(xy[:, 0] * xy[:, 1])
    )
    pts = np.column_stack([xy, z])
    return (pts + rng.normal(0.0, noise, pts.shape)).astype(np.float32)


class SyntheticPairDataset:
    """Loader-compatible dataset of synthetic overlapping pairs.

    Mirrors the interface of
    :class:`d3feat_tpu.data.threedmatch.ThreeDMatchPairDataset` (``__len__``
    + ``packed``) so the trainer/loader stack can run hermetically.
    """

    def __init__(self, size: int = 16, n_points: int = 400, num_corr: int = 24,
                 extent: float = 2.0, seed: int = 0, **augment_kwargs):
        self.size = size
        self.n_points = n_points
        self.num_corr = num_corr
        self.extent = extent
        self.seed = seed
        self.augment_kwargs = augment_kwargs

    def __len__(self) -> int:
        return self.size

    def packed(self, index: int, *, point_capacity: int, corr_capacity: int):
        from d3feat_tpu.data.pack import pack_pair

        rng = np.random.default_rng(self.seed * 100003 + index)
        pts0, pts1, corr, dk = synthetic_pair(
            rng, n_points=self.n_points, num_corr=self.num_corr,
            extent=self.extent, **self.augment_kwargs,
        )
        ones = np.ones((self.n_points, 1), np.float32)
        return pack_pair(
            pts0, pts1, ones, ones, corr, dk,
            point_capacity=point_capacity, corr_capacity=corr_capacity,
        )


def synthetic_pair(
    rng: np.random.Generator,
    n_points: int = 4096,
    num_corr: int = 128,
    extent: float = 3.0,
    **augment_kwargs,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """An overlapping fragment pair with known correspondences.

    Returns (pts0, pts1, corr [M,2], dist_keypts [M,M]): pts1 is a noisy
    SE(3) transform of the same underlying surface, and corr maps the first
    ``num_corr`` shared sample indices.
    """
    base = synthetic_fragment(rng, n_points, extent)
    pts0, pts1, _ = augment_pair(rng, base.copy(), base.copy(), **augment_kwargs)
    sel = rng.choice(n_points, size=min(num_corr, n_points), replace=False)
    corr = np.stack([sel, sel], axis=1).astype(np.int32)
    kp = pts0[sel]
    dist_keypts = np.linalg.norm(kp[:, None] - kp[None], axis=-1).astype(np.float32)
    return pts0, pts1, corr, dist_keypts
