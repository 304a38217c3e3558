"""On-device voxel-grid barycenter subsampling.

TPU-native replacement for the reference's C++ CPU subsampler
(reference: cpp_wrappers/cpp_subsampling/grid_subsampling/grid_subsampling.cpp:5-103
and its batched variant :109-210): every point is binned into a voxel of
side ``voxel_size`` anchored at ``floor(min_corner / dl) * dl`` per cloud,
and each occupied voxel emits the barycenter of its points. Clouds of a
stacked batch are subsampled independently (their own origin and voxel
grid), matching ``subsample_batch`` semantics.

The reference returns a variable number of points in ``unordered_map``
iteration order (nondeterministic). Here the op is a fixed-capacity, jittable
XLA program: occupied voxels are discovered with a lexicographic sort +
segment reduction, emitted deterministically sorted by (cloud, z, y, x), and
padded up to ``out_capacity`` with shadow coordinates (+1e6). Downstream
consumers never depend on point order (neighbor lists are recomputed per
level), so the ordering difference is semantically irrelevant.

Layout invariant used throughout the framework: valid points of cloud 0
occupy rows [0, n0), cloud 1 rows [n0, n0+n1), ... and padding fills the
tail. The op preserves this invariant in its output.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

SHADOW_COORD = 1.0e6  # shadow/padding coordinate (reference: models/blocks.py:277)
_MAX_CELLS = 1 << 16  # per-axis voxel-grid bound (16 bits per axis in sort keys)


class SubsampleResult(NamedTuple):
    points: jax.Array   # [C, 3] float32, shadow-padded
    lengths: jax.Array  # [B] int32, per-cloud retained counts
    valid: jax.Array    # [C] bool
    overflow: jax.Array  # [] bool — true if occupied voxels exceeded capacity


def lengths_to_cloud_ids(lengths: jax.Array, n: int) -> jax.Array:
    """[N] cloud id per row for the contiguous stacked layout; padding -> B."""
    cum = jnp.cumsum(lengths)
    idx = jnp.arange(n, dtype=lengths.dtype)
    return jnp.sum(idx[:, None] >= cum[None, :], axis=1).astype(jnp.int32)


def lengths_to_mask(lengths: jax.Array, n: int) -> jax.Array:
    """[N] bool validity mask for the contiguous stacked layout."""
    total = jnp.sum(lengths)
    return jnp.arange(n) < total


@functools.partial(jax.jit, static_argnames=("out_capacity", "num_clouds"))
def voxel_subsample(
    points: jax.Array,
    lengths: jax.Array,
    voxel_size: jax.Array | float,
    *,
    out_capacity: int,
    num_clouds: int,
) -> SubsampleResult:
    """Barycenter voxel subsampling of a stacked, contiguous batch of clouds.

    Args:
      points: [N, 3] float32. Rows beyond sum(lengths) are padding.
      lengths: [num_clouds] int32 valid counts.
      voxel_size: scalar voxel edge length.
      out_capacity: static output row count.
      num_clouds: static number of stacked clouds.

    Returns:
      SubsampleResult with barycenters sorted by (cloud, voxel z, y, x),
      contiguous per cloud, shadow-padded to ``out_capacity``.
    """
    n = points.shape[0]
    b = num_clouds
    dl = jnp.asarray(voxel_size, dtype=points.dtype)

    cid = lengths_to_cloud_ids(lengths, n)          # [N] in [0, B]
    valid = cid < b

    # Per-cloud origin: floor(min_corner / dl) * dl (grid_subsampling.cpp:26).
    big = jnp.asarray(SHADOW_COORD, points.dtype)
    masked_pts = jnp.where(valid[:, None], points, big)
    cid_c = jnp.minimum(cid, b - 1)
    mins = jax.ops.segment_min(masked_pts, cid_c, num_segments=b)  # [B, 3]
    origin = jnp.floor(mins / dl) * dl

    # Integer cell coordinates relative to the cloud's origin.
    rel = (points - origin[cid_c]) / dl
    cell = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, _MAX_CELLS - 1)  # [N, 3]

    # Two-word sort key: primary (cloud, z), secondary (y, x).
    inval = jnp.uint32(0xFFFFFFFF)
    k_lo = (cell[:, 0].astype(jnp.uint32)
            | (cell[:, 1].astype(jnp.uint32) << 16))
    k_hi = (cell[:, 2].astype(jnp.uint32)
            | (cid.astype(jnp.uint32) << 16))
    k_lo = jnp.where(valid, k_lo, inval)
    k_hi = jnp.where(valid, k_hi, inval)

    order = jnp.lexsort((k_lo, k_hi))
    s_lo, s_hi = k_lo[order], k_hi[order]
    s_pts = points[order]
    s_valid = valid[order]
    s_cid = cid[order]

    is_first = jnp.concatenate([
        jnp.ones((1,), bool),
        (s_lo[1:] != s_lo[:-1]) | (s_hi[1:] != s_hi[:-1]),
    ])
    seg = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # [N] segment per point

    w = s_valid.astype(points.dtype)
    sums = jax.ops.segment_sum(s_pts * w[:, None], seg, num_segments=n)
    cnts = jax.ops.segment_sum(w, seg, num_segments=n)
    seg_cid = jax.ops.segment_max(
        jnp.where(s_valid, s_cid, -1), seg, num_segments=n
    )

    n_unique = jnp.sum(is_first & s_valid)  # valid voxels (come first, sorted)
    c = out_capacity
    out_slot_valid = jnp.arange(c) < jnp.minimum(n_unique, c)
    bary = sums[:c] / jnp.maximum(cnts[:c], 1.0)[:, None]
    out_points = jnp.where(out_slot_valid[:, None], bary, big)
    out_cid = jnp.where(out_slot_valid, seg_cid[:c], b)

    out_lengths = jax.ops.segment_sum(
        out_slot_valid.astype(jnp.int32), jnp.minimum(out_cid, b), num_segments=b + 1
    )[:b]

    return SubsampleResult(
        points=out_points.astype(jnp.float32),
        lengths=out_lengths.astype(jnp.int32),
        valid=out_slot_valid,
        overflow=n_unique > c,
    )
