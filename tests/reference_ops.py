"""Plain-numpy reference implementations of the geometry semantics.

These reproduce the observable behavior of the reference C++ ops
(grid barycenter subsampling, radius search sorted by distance with shadow
padding) in the simplest possible way, to serve as ground truth for the
fixed-capacity XLA ops. Order-invariant where the reference is
nondeterministic (unordered_map iteration).
"""

from __future__ import annotations

import numpy as np


def np_voxel_subsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Barycenter of every occupied voxel of one cloud. Row order: sorted by
    (z-cell, y-cell, x-cell)."""
    origin = np.floor(points.min(axis=0) / voxel_size) * voxel_size
    cell = np.floor((points - origin) / voxel_size).astype(np.int64)
    key = (cell[:, 2] << 40) + (cell[:, 1] << 20) + cell[:, 0]
    order = np.argsort(key, kind="stable")
    skey = key[order]
    spts = points[order]
    uniq, inv = np.unique(skey, return_inverse=True)
    sums = np.zeros((len(uniq), 3))
    np.add.at(sums, inv, spts)
    cnts = np.bincount(inv, minlength=len(uniq)).astype(np.float64)
    return sums / cnts[:, None]


def np_batch_voxel_subsample(points: np.ndarray, lengths, voxel_size: float):
    """Per-cloud independent subsampling of a stacked batch."""
    outs, out_lens = [], []
    i0 = 0
    for n in lengths:
        outs.append(np_voxel_subsample(points[i0 : i0 + n], voxel_size))
        out_lens.append(len(outs[-1]))
        i0 += n
    return np.concatenate(outs, axis=0), np.array(out_lens)


def np_radius_neighbors(
    queries: np.ndarray,
    supports: np.ndarray,
    q_lengths,
    s_lengths,
    radius: float,
    max_k: int,
) -> np.ndarray:
    """[Nq, max_k] indices sorted ascending by distance, shadow = len(supports)."""
    nq = len(queries)
    ns = len(supports)
    out = np.full((nq, max_k), ns, dtype=np.int64)
    qi0 = 0
    si0 = 0
    for qn, sn in zip(q_lengths, s_lengths):
        for i in range(qi0, qi0 + qn):
            d = np.linalg.norm(supports[si0 : si0 + sn] - queries[i], axis=1)
            ok = np.where(d <= radius)[0]
            ok = ok[np.argsort(d[ok], kind="stable")][:max_k]
            out[i, : len(ok)] = ok + si0
        qi0 += qn
        si0 += sn
    return out
