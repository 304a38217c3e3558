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


@functools.partial(
    jax.jit, static_argnames=("out_capacity", "num_clouds", "occupancy_cap")
)
def voxel_subsample(
    points: jax.Array,
    lengths: jax.Array,
    voxel_size: jax.Array | float,
    *,
    out_capacity: int,
    num_clouds: int,
    occupancy_cap: int = 64,
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
    # B is tiny and static: unrolled masked reductions instead of
    # segment_min — scatter-based segment ops cost ~5 ms flat on TPU.
    big = jnp.asarray(SHADOW_COORD, points.dtype)
    mins = jnp.stack([
        jnp.min(jnp.where((cid == c_)[:, None], points, big), axis=0)
        for c_ in range(b)
    ])  # [B, 3]
    cid_c = jnp.minimum(cid, b - 1)
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

    # one variadic sort carrying the coordinates as PAYLOADS: an argsort
    # (lexsort) would cost three row-gathers afterwards (~0.8 ms at L0
    # scale) to reorder points/valid/cid; validity and cloud id are
    # recomputed from the sorted keys instead (valid <=> k_hi != inval,
    # cid = high bits of k_hi)
    s_hi, s_lo, sx, sy, sz = jax.lax.sort(
        (k_hi, k_lo, points[:, 0], points[:, 1], points[:, 2]),
        num_keys=2, is_stable=False,
    )
    s_pts = jnp.stack([sx, sy, sz], axis=1)
    s_valid = s_hi != inval
    s_cid = jnp.where(s_valid, (s_hi >> 16).astype(jnp.int32), b)

    is_first = jnp.concatenate([
        jnp.ones((1,), bool),
        (s_lo[1:] != s_lo[:-1]) | (s_hi[1:] != s_hi[:-1]),
    ])
    seg = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # [N] run id, ascending

    # Scatter-free segment reduction: runs are contiguous in the sorted
    # order, so a segmented inclusive prefix (Hillis-Steele doubling over
    # the sorted rows) leaves each run's total sum/count in its LAST row
    # after ceil(log2(window)) shifted masked adds. A voxel of edge dl over
    # points spaced >= dl_prev holds at most ~(dl/dl_prev + 1)^3 points, so
    # a small window covers every real run (checked exactly below). This
    # costs ~log2(window) cheap [N, 4] passes where the previous
    # [capacity, window] occupancy gather cost ~1 ms at L1 scale;
    # segment_sum would lower to a scatter (a flat ~5 ms on TPU).
    c = out_capacity
    run_ids = jnp.arange(c)
    steps = max(1, (occupancy_cap - 1).bit_length())
    window = 1 << steps
    vals = jnp.concatenate(
        [s_pts.astype(jnp.float32), jnp.ones((n, 1), jnp.float32)], axis=1)
    for sft in (1 << t for t in range(steps)):
        same = seg[sft:] == seg[:-sft]
        vals = vals.at[sft:].add(jnp.where(same[:, None], vals[:-sft], 0.0))

    # Run boundaries via broadcast compare-count (left insertion points);
    # searchsorted(method='sort') here would re-sort [N] per call, and the
    # default 'scan' lowers to a ~1 ms while loop.
    ends = jnp.sum(seg[None, :] <= run_ids[:, None], axis=1)  # [c] in [0, n]
    starts = jnp.concatenate([jnp.zeros((1,), ends.dtype), ends[:-1]])
    last = jnp.maximum(ends - 1, 0)
    sums = vals[last, :3]                            # [c, 3] run sums
    cnts = (ends - starts).astype(points.dtype)      # exact run lengths
    seg_cid = s_cid[last]                            # cid at the run end

    n_unique = jnp.sum(is_first & s_valid)  # valid voxels (come first, sorted)
    out_slot_valid = run_ids < jnp.minimum(n_unique, c)
    # scan-window check only over valid runs (all padding rows share one
    # giant run that must not trip the flag); a run longer than the window
    # would have an incomplete sum, so it flags overflow exactly as the
    # gather cap used to
    occ_overflow = jnp.max(
        jnp.where(out_slot_valid, ends - starts, 0)
    ) > window
    bary = sums / jnp.maximum(cnts, 1.0)[:, None]
    out_points = jnp.where(out_slot_valid[:, None], bary, big)
    out_cid = jnp.where(out_slot_valid, seg_cid, b)

    out_lengths = jnp.stack([
        jnp.sum((out_cid == c_).astype(jnp.int32)) for c_ in range(b)
    ])

    return SubsampleResult(
        points=out_points.astype(jnp.float32),
        lengths=out_lengths.astype(jnp.int32),
        valid=out_slot_valid,
        overflow=(n_unique > c) | occ_overflow,
    )
