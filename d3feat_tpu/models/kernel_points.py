"""Kernel-point dispositions for KPConv.

Generates K kernel-point positions inside a unit ball and caches them on
disk, mirroring the capability of the reference generator
(reference: kernels/kernel_points.py:78-482) with a fresh numpy
implementation:

* K <= 30: repulsive-potential gradient descent over many random candidate
  kernels, keeping the candidate with the lowest final gradient norm
  (reference: kernel_points.py:258-437).
* K > 30: Lloyd's algorithm with Monte-Carlo Voronoi-cell estimation
  (reference: kernel_points.py:78-255).

On load, the reference applies a random rotation + N(0, 0.01) jitter +
radius scaling (reference: kernel_points.py:445-482). Here the rotation and
jitter are driven by an explicit seed and disabled by default
(``deterministic=True``) so that training runs are reproducible and
checkpoint parity is exact: when converting a PyTorch checkpoint the kernel
points come from the checkpoint itself (they are stored as a parameter,
reference: models/blocks.py:234-235).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "dispositions")


def rotation_from_axis_angle(axis: np.ndarray, angle: float) -> np.ndarray:
    """Rodrigues rotation matrix for a unit axis and an angle."""
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    kx, ky, kz = axis
    K = np.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def _init_in_ball(rng: np.random.Generator, n: int, dim: int, r_max: float) -> np.ndarray:
    """Uniform samples inside a ball of radius r_max via rejection."""
    pts = np.zeros((0, dim))
    while pts.shape[0] < n:
        cand = rng.uniform(-r_max, r_max, size=(2 * n, dim))
        cand = cand[np.sum(cand**2, axis=1) < r_max**2]
        pts = np.concatenate([pts, cand], axis=0)
    return pts[:n]


def _apply_fixed(points: np.ndarray, fixed: str) -> np.ndarray:
    """Pin special kernel points: the center and/or two vertical points."""
    if fixed in ("center", "verticals"):
        points[..., 0, :] = 0.0
    if fixed == "verticals":
        points[..., 1, :] = 0.0
        points[..., 2, :] = 0.0
        points[..., 1, -1] = 2.0 / 3.0
        points[..., 2, -1] = -2.0 / 3.0
    return points


def optimize_repulsion(
    num_points: int,
    dimension: int = 3,
    fixed: str = "center",
    num_candidates: int = 100,
    ratio: float = 0.66,
    max_iter: int = 10000,
    seed: int = 42,
):
    """Place kernel points by minimizing a repulsive + centering potential.

    Vectorized over ``num_candidates`` independent random initializations;
    returns (points [num_candidates, num_points, dim], final gradient norms
    [num_candidates]). Semantics follow the reference optimizer
    (reference: kernels/kernel_points.py:258-397): inverse-square repulsion
    between points, a linear attraction to the origin with weight 10, fixed
    points held in place, gradient-norm-change stopping criterion, and a
    final rescale so the mean non-center radius equals ``ratio``.
    """
    rng = np.random.default_rng(seed)
    radius0 = 1.0
    step = 1e-2
    step_decay = 0.9995
    clip = 0.05 * radius0
    thresh = 1e-5

    kp = _init_in_ball(rng, num_candidates * num_points, dimension, radius0 * np.sqrt(0.5))
    kp = kp.reshape(num_candidates, num_points, dimension)
    kp = _apply_fixed(kp, fixed)
    n_fixed = {"center": 1, "verticals": 3}.get(fixed, 0)

    saved_norms = np.zeros(num_candidates)
    prev_norms = np.zeros((num_candidates, num_points))
    for it in range(max_iter):
        diff = kp[:, :, None, :] - kp[:, None, :, :]  # [C, K, K, dim]
        d2 = np.sum(diff**2, axis=-1)
        rep = diff / (np.power(d2[..., None], 1.5) + 1e-6)
        grads = np.sum(rep, axis=2) + 10.0 * kp  # repulsion + centering
        if fixed == "verticals":
            grads[:, 1:3, :-1] = 0.0

        norms = np.sqrt(np.sum(grads**2, axis=-1))  # [C, K]
        saved_norms = np.max(norms[:, n_fixed:], axis=1) if n_fixed else np.max(norms, axis=1)
        moving = norms[:, n_fixed:] if n_fixed else norms
        prev_moving = prev_norms[:, n_fixed:] if n_fixed else prev_norms
        if np.max(np.abs(prev_moving - moving)) < thresh:
            break
        prev_norms = norms

        dist = np.minimum(step * norms, clip)
        if n_fixed:
            dist[:, :n_fixed] = 0.0
        kp = kp - dist[..., None] * grads / (norms[..., None] + 1e-6)
        step *= step_decay

    r = np.sqrt(np.sum(kp**2, axis=-1))
    kp = kp * (ratio / np.mean(r[:, 1:], axis=1))[:, None, None]
    return kp, saved_norms


def lloyd_sphere(
    num_points: int,
    dimension: int = 3,
    fixed: str = "center",
    approx_n: int = 5000,
    max_iter: int = 500,
    momentum: float = 0.9,
    seed: int = 42,
) -> np.ndarray:
    """Lloyd relaxation of K cells in the unit ball (Monte-Carlo centroids).

    Used for large K (reference switches at K>30; kernels/kernel_points.py:408).
    """
    rng = np.random.default_rng(seed)
    kp = _init_in_ball(rng, num_points, dimension, 1.0)
    # match the reference's shell initialization (radius in [0.9, 1.0))
    norms = np.linalg.norm(kp, axis=1, keepdims=True) + 1e-9
    kp = kp / norms * (0.9 + 0.1 * rng.random((num_points, 1)))
    kp = _apply_fixed(kp[None], fixed)[0]

    for _ in range(max_iter):
        X = rng.uniform(-1.0, 1.0, size=(approx_n, dimension))
        X = X[np.sum(X**2, axis=1) < 1.0]
        d2 = np.sum((X[:, None, :] - kp[None]) ** 2, axis=-1)
        cell = np.argmin(d2, axis=1)
        counts = np.bincount(cell, minlength=num_points).astype(np.float64)
        sums = np.zeros_like(kp)
        for d in range(dimension):
            sums[:, d] = np.bincount(cell, weights=X[:, d], minlength=num_points)
        centers = np.where(counts[:, None] > 0, sums / np.maximum(counts[:, None], 1), kp)
        kp = kp + (1 - momentum) * (centers - kp)
        kp = _apply_fixed(kp[None], fixed)[0]
    return kp


def generate_kernel_points(
    num_kpoints: int, dimension: int = 3, fixed: str = "center", seed: int = 42
) -> np.ndarray:
    """Unit-radius disposition: repulsion optimizer for K<=30, Lloyd above."""
    if num_kpoints > 30:
        return lloyd_sphere(num_kpoints, dimension, fixed, seed=seed)
    kps, grad_norms = optimize_repulsion(num_kpoints, dimension, fixed, seed=seed)
    return kps[int(np.argmin(grad_norms))]


def load_kernels(
    radius: float,
    num_kpoints: int,
    dimension: int = 3,
    fixed: str = "center",
    deterministic: bool = True,
    seed: Optional[int] = None,
    cache_dir: Optional[str] = None,
) -> np.ndarray:
    """Load (or generate + cache) a kernel disposition, scaled to ``radius``.

    Counterpart of the reference loader (kernels/kernel_points.py:400-482).
    With ``deterministic=False`` a seeded random z-rotation and N(0, 0.01)
    jitter are applied before scaling, matching the reference's load-time
    augmentation; by default the disposition is returned as-is for
    reproducibility.
    """
    cache_dir = cache_dir or _CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    cache_file = os.path.join(cache_dir, f"k_{num_kpoints:03d}_{fixed}_{dimension}D.npy")
    if os.path.exists(cache_file):
        kp = np.load(cache_file)
    else:
        kp = generate_kernel_points(num_kpoints, dimension, fixed)
        np.save(cache_file, kp)

    if not deterministic:
        rng = np.random.default_rng(seed)
        theta = rng.random() * 2 * np.pi
        if dimension == 3:
            c, s = np.cos(theta), np.sin(theta)
            R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        elif dimension == 2:
            c, s = np.cos(theta), np.sin(theta)
            R = np.array([[c, -s], [s, c]])
        else:
            R = np.eye(dimension)
        kp = kp + rng.normal(scale=0.01, size=kp.shape)
        kp = (radius * kp) @ R
    else:
        kp = radius * kp
    return kp.astype(np.float32)
