"""On-device fixed-width radius neighbor search.

TPU-native replacement for the reference's nanoflann KD-tree radius search
(reference: cpp_wrappers/cpp_neighbors/neighbors/neighbors.cpp:211-332).
Semantics reproduced exactly:

* each query row gets up to ``max_k`` support indices within ``radius``,
  **sorted ascending by distance** (load-bearing downstream: nearest-
  upsampling reads column 0 only, reference models/blocks.py:79-91 and
  neighbors.cpp:265 ``search_params.sorted = true``);
* unused slots carry the shadow index == number of support rows
  (reference: neighbors.cpp:324), which downstream ops map to a zero
  feature row / +1e6 coordinate;
* queries and supports from different clouds of the stacked batch never
  match (the reference searches per-batch KD-trees).

Instead of a tree, the search is a tiled dense computation that maps onto
the MXU: squared distances for a tile of queries against all supports via
one matmul, then ``lax.top_k`` of the negated distances, which yields the
ascending-by-distance ordering for free. The tile loop is a ``lax.map`` so
peak memory is one [tile, S] panel regardless of N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from d3feat_tpu.ops.subsample import lengths_to_cloud_ids

_INF = jnp.float32(3.0e38)
SHADOW_LIKE = 1.0e6  # matches ops.subsample.SHADOW_COORD


@functools.partial(jax.jit, static_argnames=("max_k", "num_clouds", "query_tile"))
def radius_neighbors(
    queries: jax.Array,
    supports: jax.Array,
    q_lengths: jax.Array,
    s_lengths: jax.Array,
    radius: jax.Array | float,
    *,
    max_k: int,
    num_clouds: int,
    query_tile: int = 1024,
) -> jax.Array:
    """[Nq, max_k] int32 support indices within ``radius``, distance-sorted.

    Args:
      queries: [Nq, 3] stacked contiguous clouds (padding tail rows ignored).
      supports: [Ns, 3] same layout.
      q_lengths / s_lengths: [num_clouds] int32 valid counts.
      radius: search radius (scalar).
      max_k: static neighbor-list width (the calibrated per-layer cap,
        reference datasets/dataloader.py:64-65).
      num_clouds: static stacked-cloud count.
      query_tile: static tile size for the query loop.

    Returns:
      Neighbor index matrix; rows of invalid (padding) queries are all
      shadow. Shadow index == supports.shape[0].
    """
    nq, ns = queries.shape[0], supports.shape[0]
    shadow = jnp.int32(ns)
    r2 = jnp.asarray(radius, jnp.float32) ** 2

    q_cid = lengths_to_cloud_ids(q_lengths, nq)
    s_cid = lengths_to_cloud_ids(s_lengths, ns)
    q_valid = q_cid < num_clouds
    s_valid = s_cid < num_clouds
    # invalid queries get id -1 so they can never equal an (invalid) support id
    q_cid = jnp.where(q_valid, q_cid, -1)

    # Stabilize the |q|^2 - 2q.s + |s|^2 expansion by centering on the scene.
    total_q = jnp.maximum(jnp.sum(q_lengths), 1).astype(jnp.float32)
    center = jnp.sum(jnp.where(q_valid[:, None], queries, 0.0), axis=0) / total_q
    qc = (queries - center).astype(jnp.float32)
    sc = (supports - center).astype(jnp.float32)
    # Keep padding coordinates bounded so fp32 products stay exact-ish.
    qc = jnp.where(q_valid[:, None], qc, 0.0)
    sc = jnp.where(s_valid[:, None], sc, 0.0)

    s_sq = jnp.sum(sc * sc, axis=1)  # [Ns]
    k = min(max_k, ns)

    pad = (-nq) % query_tile
    qc_p = jnp.pad(qc, ((0, pad), (0, 0)))
    qcid_p = jnp.pad(q_cid, (0, pad), constant_values=-1)
    n_tiles = qc_p.shape[0] // query_tile
    qc_t = qc_p.reshape(n_tiles, query_tile, 3)
    qcid_t = qcid_p.reshape(n_tiles, query_tile)

    def one_tile(args):
        qt, qt_cid = args  # [T, 3], [T]
        q_sq = jnp.sum(qt * qt, axis=1)
        d2 = (q_sq[:, None] - 2.0 * (qt @ sc.T) + s_sq[None, :])  # [T, Ns]
        same = qt_cid[:, None] == s_cid[None, :]
        d2 = jnp.where(same, d2, _INF)
        neg, idx = jax.lax.top_k(-d2, k)  # candidate set, roughly ascending
        # Exact re-rank: the matmul expansion loses ~1e-6 absolute precision,
        # enough to swap near-equal distances. Recompute |q-s|^2 exactly for
        # the k candidates and sort, so row ordering and the radius test match
        # the reference's exact arithmetic (neighbors.cpp:265 sorted=true).
        # Cross-cloud validity rides the d2 values (neg > -INF) — gathering
        # the boolean matrix instead is a measured TPU compile-time hog.
        cand = jnp.take(sc, idx, axis=0)  # [T, k, 3]
        diff = cand - qt[:, None, :]
        d2e = jnp.sum(diff * diff, axis=-1)  # [T, k]
        keep = (neg > -_INF) & (d2e <= r2)
        d2e = jnp.where(keep, d2e, _INF)
        rank = jnp.argsort(d2e, axis=1)
        idx = jnp.take_along_axis(idx, rank, axis=1)
        keep = jnp.take_along_axis(keep, rank, axis=1)
        idx = jnp.where(keep, idx, shadow)
        return idx.astype(jnp.int32)

    out = jax.lax.map(one_tile, (qc_t, qcid_t))  # [n_tiles, T, k]
    out = out.reshape(n_tiles * query_tile, k)[:nq]
    if k < max_k:
        out = jnp.pad(out, ((0, 0), (0, max_k - k)), constant_values=ns)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("max_k", "num_clouds", "query_tile", "band_cap"),
)
def radius_neighbors_banded(
    queries: jax.Array,
    supports: jax.Array,
    q_lengths: jax.Array,
    s_lengths: jax.Array,
    radius: jax.Array | float,
    *,
    max_k: int,
    num_clouds: int,
    query_tile: int = 1024,
    band_cap: int = 4096,
) -> tuple[jax.Array, jax.Array]:
    """Banded radius search: brute-force contract, ~(Ns/band) x less work.

    TPU-idiomatic locality without gathers: queries and supports are sorted
    by (cloud, coordinate bin) along each cloud's LONGEST bounding-box axis
    (bin edge = radius). A tile of consecutive sorted queries then only
    needs the CONTIGUOUS run of sorted supports whose bin overlaps the
    tile's range ±1 — extracted with one ``dynamic_slice`` of static width
    ``band_cap`` (no random-access gathers, which the cell-grid variant
    showed are VPU-bound on TPU). Within the band the computation is the
    same exact matmul-panel + top-k + re-rank as :func:`radius_neighbors`.
    Output rows are restored to the original query order.

    Returns (neighbors [Nq, max_k] int32, overflow []). ``overflow`` is
    True when some tile's true band exceeded ``band_cap`` (neighbors may be
    missed — raise the cap).
    """
    nq, ns = queries.shape[0], supports.shape[0]
    shadow = jnp.int32(ns)
    r = jnp.asarray(radius, jnp.float32)
    r2 = r * r

    q_cid = lengths_to_cloud_ids(q_lengths, nq)
    s_cid = lengths_to_cloud_ids(s_lengths, ns)
    q_valid = q_cid < num_clouds
    s_valid = s_cid < num_clouds

    big = jnp.float32(3.0e37)

    # density-aware banding axis over the SUPPORTS (what fills the band);
    # see make_level_frame — axis-aligned planes perpendicular to a naive
    # longest-axis pick project onto one key plateau and overflow the band
    axis_dir, _ = make_level_frame(
        supports, s_lengths, num_clouds, window=2.0 * r + 0.04
    )  # [B, 3]
    # origin from the combined q ∪ s bbox so no valid query clamps to bin 0
    cidc_q = jnp.minimum(q_cid, num_clouds - 1)
    cidc_s = jnp.minimum(s_cid, num_clouds - 1)
    proj_q = jnp.sum(queries.astype(jnp.float32) * axis_dir[cidc_q], axis=1)
    proj_s = jnp.sum(supports.astype(jnp.float32) * axis_dir[cidc_s], axis=1)
    o_q = jax.ops.segment_min(
        jnp.where(q_valid, proj_q, big), cidc_q, num_segments=num_clouds)
    o_s = jax.ops.segment_min(
        jnp.where(s_valid, proj_s, big), cidc_s, num_segments=num_clouds)
    origin = jnp.minimum(o_q, o_s)  # [B]

    # continuous float keys (cloud offset + projection), like SortedLevel:
    # integer r-bins added up to 2 bins (~2r of rows) of window slack
    koff = jnp.float32(SortedLevel.KOFF)
    keps = jnp.float32(SortedLevel.EPS)

    def keys_of(proj, cid, valid):
        cidc = jnp.minimum(cid, num_clouds - 1)
        p = jnp.clip(proj - origin[cidc], 0.0, koff - 1.0)
        key = cid.astype(jnp.float32) * koff + p
        return jnp.where(valid, key, num_clouds * koff)

    q_key = keys_of(proj_q, q_cid, q_valid)
    s_key = keys_of(proj_s, s_cid, s_valid)

    qord = jnp.argsort(q_key)
    sord = jnp.argsort(s_key)
    qk = q_key[qord]
    sk = s_key[sord]
    qs = queries.astype(jnp.float32)[qord]
    qcid_s = jnp.where(q_valid, q_cid, -1)[qord]
    ss = supports.astype(jnp.float32)[sord]
    scid_s = s_cid[sord]
    sidx_s = sord.astype(jnp.int32)

    # pad the sorted support arrays so any dynamic_slice window is in range
    ss_pad = jnp.concatenate(
        [ss, jnp.full((band_cap, 3), jnp.float32(SHADOW_LIKE))], axis=0)
    scid_pad = jnp.concatenate(
        [scid_s, jnp.full((band_cap,), num_clouds, jnp.int32)])
    sidx_pad = jnp.concatenate(
        [sidx_s, jnp.full((band_cap,), shadow, jnp.int32)])

    # stabilize the matmul expansion: center on the scene
    total_q = jnp.maximum(jnp.sum(q_lengths), 1).astype(jnp.float32)
    center = jnp.sum(
        jnp.where(q_valid[:, None], queries, 0.0), axis=0) / total_q
    qs_c = jnp.where((qcid_s >= 0)[:, None], qs - center, 0.0)
    ss_c = jnp.where((scid_pad < num_clouds)[:, None], ss_pad - center, 0.0)

    pad = (-nq) % query_tile
    qk_p = jnp.pad(qk, (0, pad),
                   constant_values=float((num_clouds + 1) * SortedLevel.KOFF))
    qc_p = jnp.pad(qs_c, ((0, pad), (0, 0)))
    qcid_p = jnp.pad(qcid_s, (0, pad), constant_values=-1)
    n_tiles = qk_p.shape[0] // query_tile
    k = min(max_k, band_cap)

    def one_tile(args):
        # Lean map body: validity rides the d2 values (no boolean-matrix
        # gathers), and band positions — not original indices — leave the
        # loop; the sidx translation is one vectorized gather outside.
        tkeys, qt, qt_cid = args  # [T], [T,3], [T]
        valid_t = qt_cid >= 0
        kmin = jnp.min(jnp.where(valid_t, tkeys, jnp.float32(3.0e37)))
        kmax = jnp.max(jnp.where(valid_t, tkeys, jnp.float32(-3.0e37)))
        lo = jnp.searchsorted(sk, kmin - r - keps)
        hi = jnp.searchsorted(sk, kmax + r + keps)
        overflow_t = (hi - lo) > band_cap

        band = jax.lax.dynamic_slice(ss_c, (lo, 0), (band_cap, 3))
        band_cid = jax.lax.dynamic_slice(scid_pad, (lo,), (band_cap,))

        q_sq = jnp.sum(qt * qt, axis=1)
        b_sq = jnp.sum(band * band, axis=1)
        d2 = q_sq[:, None] - 2.0 * (qt @ band.T) + b_sq[None, :]  # [T, band]
        same = qt_cid[:, None] == band_cid[None, :]
        d2 = jnp.where(same, d2, _INF)
        neg, sel = jax.lax.top_k(-d2, k)
        cand = jnp.take(band, sel.reshape(-1), axis=0).reshape(
            query_tile, k, 3)
        diff = cand - qt[:, None, :]
        d2e = jnp.sum(diff * diff, axis=-1)
        keep = (neg > -_INF) & (d2e <= r2)
        d2e = jnp.where(keep, d2e, _INF)
        rank = jnp.argsort(d2e, axis=1)
        sel = jnp.take_along_axis(sel, rank, axis=1)
        keep = jnp.take_along_axis(keep, rank, axis=1)
        pos = jnp.where(keep, sel + lo, ns + band_cap - 1)  # global sorted pos
        return pos.astype(jnp.int32), overflow_t

    pos_sorted, overflows = jax.lax.map(
        one_tile,
        (
            qk_p.reshape(n_tiles, query_tile),
            qc_p.reshape(n_tiles, query_tile, 3),
            qcid_p.reshape(n_tiles, query_tile),
        ),
    )
    pos_sorted = pos_sorted.reshape(-1, k)[:nq]
    out_sorted = sidx_pad[jnp.minimum(pos_sorted, ns + band_cap - 1)]
    if k < max_k:
        out_sorted = jnp.pad(
            out_sorted, ((0, 0), (0, max_k - k)), constant_values=ns)
    inv = jnp.argsort(qord)
    return out_sorted[inv], jnp.any(overflows)


@functools.partial(
    jax.jit,
    static_argnames=("max_k", "num_clouds", "query_tile", "band_cap",
                     "interpret"),
)
def radius_neighbors_pallas(
    queries: jax.Array,
    supports: jax.Array,
    q_lengths: jax.Array,
    s_lengths: jax.Array,
    radius: jax.Array | float,
    *,
    max_k: int,
    num_clouds: int,
    query_tile: int = 256,
    band_cap: int = 2048,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Banded radius search with the selection fused into a Pallas kernel.

    Same preprocessing (longest-axis keys, sorts, per-tile contiguous
    bands) and contract as :func:`radius_neighbors_banded`, but the
    [tile, band] distance panel + k-nearest extraction run entirely in
    VMEM (:mod:`d3feat_tpu.ops.pallas.select`) — exact elementwise
    arithmetic, no HBM panel round-trip, no re-rank pass.
    """
    from d3feat_tpu.ops.pallas.select import (
        band_select,
        pack_queries,
        pack_supports,
    )

    nq, ns = queries.shape[0], supports.shape[0]
    shadow = jnp.int32(ns)
    r = jnp.asarray(radius, jnp.float32)

    q_cid = lengths_to_cloud_ids(q_lengths, nq)
    s_cid = lengths_to_cloud_ids(s_lengths, ns)
    q_valid = q_cid < num_clouds
    s_valid = s_cid < num_clouds

    big = jnp.float32(3.0e37)

    # density-aware banding axis over the supports + continuous float keys
    # (see radius_neighbors_banded / make_level_frame)
    axis_dir, _ = make_level_frame(
        supports, s_lengths, num_clouds, window=2.0 * r + 0.04)
    cidc_q = jnp.minimum(q_cid, num_clouds - 1)
    cidc_s = jnp.minimum(s_cid, num_clouds - 1)
    proj_q = jnp.sum(queries.astype(jnp.float32) * axis_dir[cidc_q], axis=1)
    proj_s = jnp.sum(supports.astype(jnp.float32) * axis_dir[cidc_s], axis=1)
    o_q = jax.ops.segment_min(
        jnp.where(q_valid, proj_q, big), cidc_q, num_segments=num_clouds)
    o_s = jax.ops.segment_min(
        jnp.where(s_valid, proj_s, big), cidc_s, num_segments=num_clouds)
    origin = jnp.minimum(o_q, o_s)
    koff = jnp.float32(SortedLevel.KOFF)
    keps = jnp.float32(SortedLevel.EPS)

    def keys_of(proj, cid, valid):
        cidc = jnp.minimum(cid, num_clouds - 1)
        p = jnp.clip(proj - origin[cidc], 0.0, koff - 1.0)
        key = cid.astype(jnp.float32) * koff + p
        return jnp.where(valid, key, num_clouds * koff)

    q_key = keys_of(proj_q, q_cid, q_valid)
    s_key = keys_of(proj_s, s_cid, s_valid)
    qord = jnp.argsort(q_key)
    sord = jnp.argsort(s_key)
    qk = q_key[qord]
    sk = s_key[sord]
    qs = queries.astype(jnp.float32)[qord]
    qcid_s = jnp.where(q_valid, q_cid, -1)[qord]
    ss = supports.astype(jnp.float32)[sord]
    scid_s = s_cid[sord]
    sidx_s = sord.astype(jnp.int32)

    ss_pad = jnp.concatenate(
        [ss, jnp.full((band_cap, 3), jnp.float32(SHADOW_LIKE))], axis=0)
    scid_pad = jnp.concatenate(
        [scid_s, jnp.full((band_cap,), num_clouds, jnp.int32)])
    sidx_pad = jnp.concatenate(
        [sidx_s, jnp.full((band_cap,), shadow, jnp.int32)])

    pad = (-nq) % query_tile
    qk_p = jnp.pad(qk, (0, pad),
                   constant_values=float((num_clouds + 1) * SortedLevel.KOFF))
    qs_p = jnp.pad(qs, ((0, pad), (0, 0)))
    qcid_p = jnp.pad(qcid_s, (0, pad), constant_values=-1)
    n_tiles = qk_p.shape[0] // query_tile

    tiles = qk_p.reshape(n_tiles, query_tile)
    tvalid = qcid_p.reshape(n_tiles, query_tile) >= 0
    kmin = jnp.min(jnp.where(tvalid, tiles, jnp.float32(3.0e37)), axis=1)
    kmax = jnp.max(jnp.where(tvalid, tiles, jnp.float32(-3.0e37)), axis=1)
    starts = jnp.searchsorted(sk, kmin - r - keps).astype(jnp.int32)
    ends = jnp.searchsorted(sk, kmax + r + keps).astype(jnp.int32)
    # 8-floor to match the kernel's aligned DMA; widens downward only
    starts = jnp.minimum((starts // 8) * 8, ns)
    overflow = jnp.any((ends - starts) > band_cap)

    pos = band_select(
        pack_queries(qs_p, qcid_p),
        pack_supports(ss_pad, scid_pad),
        starts, r * r, ends,
        max_k=min(max_k, band_cap), band_cap=band_cap,
        query_tile=query_tile, interpret=interpret,
    )
    out_sorted = sidx_pad[jnp.minimum(pos[:nq], ns + band_cap - 1)]
    if out_sorted.shape[1] < max_k:
        out_sorted = jnp.pad(
            out_sorted,
            ((0, 0), (0, max_k - out_sorted.shape[1])), constant_values=ns)
    inv = jnp.argsort(qord)
    return out_sorted[inv], overflow


class SortedLevel:
    """Per-pyramid-level sorted state shared by every search at the level.

    Sorting dominates the XLA-side cost of the banded/pallas searches when
    done per call (2-3 argsorts + a lane-packed scatter each). Each level
    is instead sorted ONCE along a banding axis fixed for the whole
    pyramid, and all conv/pool/upsample searches touching the level reuse
    the sorted state. Key = cid * KOFF + (proj - origin[cid]): a single
    f32 sort key (resolution ~1e-3 at scene scale — absorbed into the
    search window margin)."""

    KOFF = 4096.0     # > any scene extent; separates clouds in the key
    EPS = 0.02        # key-resolution margin added to search windows

    def __init__(self, points, lengths, num_clouds, axis_onehot, origin,
                 band_pad: int):
        n = points.shape[0]
        cid = lengths_to_cloud_ids(lengths, n)
        valid = cid < num_clouds
        cidc = jnp.minimum(cid, num_clouds - 1)
        proj = jnp.sum(points * axis_onehot[cidc], axis=1) - origin[cidc]
        key = cid.astype(jnp.float32) * self.KOFF + jnp.clip(
            proj, 0.0, self.KOFF - 1.0
        )
        key = jnp.where(valid, key, num_clouds * self.KOFF)

        self.num_clouds = num_clouds
        self.n = n
        self.band_pad = band_pad
        # ONE variadic sort with the coordinates and row ids as payloads:
        # argsort + per-array gathers afterwards cost ~0.2 ms per gather at
        # L0 scale (gathers are the tax). cid is re-derived from the sorted
        # key (cid * KOFF + proj with proj < KOFF), not carried.
        pf = points.astype(jnp.float32)
        iota = jnp.arange(n, dtype=jnp.int32)
        self.key_sorted, sx, sy, sz, order = jax.lax.sort(
            (key, pf[:, 0], pf[:, 1], pf[:, 2], iota), num_keys=1,
            is_stable=True,  # stable: ties keep row order (shadow rows last)
        )
        self.order = order
        self.inv = jnp.argsort(order)
        pts_sorted = jnp.stack([sx, sy, sz], axis=1)
        cid_sorted = jnp.minimum(
            (self.key_sorted * (1.0 / self.KOFF)).astype(jnp.int32),
            num_clouds,
        )
        self.qcid_sorted = jnp.where(
            self.key_sorted < num_clouds * self.KOFF, cid_sorted, -1)
        self.idx_sorted_pad = jnp.concatenate([
            self.order.astype(jnp.int32),
            jnp.full((band_pad,), jnp.int32(n), jnp.int32),
        ])
        # lane-packed supports for the kernel DMA, built once per level
        from d3feat_tpu.ops.pallas.select import pack_queries, pack_supports

        pts_pad = jnp.concatenate([
            pts_sorted, jnp.full((band_pad, 3), jnp.float32(SHADOW_LIKE))
        ])
        cid_pad = jnp.concatenate([
            cid_sorted, jnp.full((band_pad,), num_clouds, jnp.int32)
        ])
        self.s_packed = pack_supports(pts_pad, cid_pad)
        self.q_packed = pack_queries(pts_sorted, self.qcid_sorted)
        self.pts_sorted = pts_sorted
        self.cid_sorted = cid_sorted


# banding-axis candidates: the 3 coordinate axes + the 4 body diagonals.
# Real indoor scans are full of axis-aligned planes (walls, floors); a plane
# PERPENDICULAR to the banding axis projects all its points onto one key
# plateau, blowing past any affordable band width. A diagonal axis is never
# perpendicular to an axis-aligned plane, and the density-aware pick below
# chooses whichever candidate has the flattest worst-case key window.
_SQ3 = 0.5773502691896258
_FRAME_DIRS = (
    (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0),
    (_SQ3, _SQ3, _SQ3), (_SQ3, _SQ3, -_SQ3),
    (_SQ3, -_SQ3, _SQ3), (-_SQ3, _SQ3, _SQ3),
)


def make_level_frame(points, lengths, num_clouds, window: float = 0.17):
    """(axis [B,3] unit banding direction, origin [B]) per cloud.

    Picks, per cloud, the candidate direction whose projected keys have the
    SMALLEST maximum row count inside any ``window``-wide key interval —
    i.e. the direction along which the band kernels' static caps are least
    stressed. ``window`` should be ~2x the level-0 search radius. Computed
    once from the level-0 clouds and reused by every level (subsampled
    barycenters stay inside the level-0 hull, with the same anisotropy).
    """
    n = points.shape[0]
    cid = lengths_to_cloud_ids(lengths, n)
    valid = cid < num_clouds
    cidc = jnp.minimum(cid, num_clouds - 1)
    big = jnp.float32(3.0e37)

    dirs = jnp.asarray(_FRAME_DIRS, jnp.float32)          # [D, 3]
    projs = points.astype(jnp.float32) @ dirs.T            # [N, D]
    lo_proj = jax.ops.segment_min(
        jnp.where(valid[:, None], projs, big), cidc, num_segments=num_clouds
    )                                                      # [B, D]

    koff = jnp.float32(SortedLevel.KOFF)
    keys = cidc[:, None].astype(jnp.float32) * koff + (projs - lo_proj[cidc])
    keys = jnp.where(valid[:, None], keys, big)
    # the probe only needs RELATIVE density across directions: a strided
    # subsample keeps it cheap, and method='sort' keeps searchsorted
    # vectorized (the default 'scan' lowers to a ~13 ms while loop at 16k)
    stride = max(1, n // 2048)
    keys = keys[::stride]
    m = keys.shape[0]
    keys_sorted = jnp.sort(keys, axis=0)                   # per-dir columns

    def win_count(col):
        # rows within [k_i, k_i + window] of each sorted key; the KOFF
        # cloud separation keeps windows inside one cloud
        return jnp.searchsorted(col, col + window,
                                method="sort") - jnp.arange(m)

    counts = jax.vmap(win_count, in_axes=1, out_axes=1)(keys_sorted)  # [m, D]
    cid_sorted = jnp.floor(keys_sorted / koff).astype(jnp.int32)
    cid_sorted = jnp.clip(cid_sorted, 0, num_clouds - 1)
    worst = jnp.stack([
        jnp.max(jnp.where(cid_sorted == b, counts, 0), axis=0)
        for b in range(num_clouds)
    ])                                                     # [B, D]
    best = jnp.argmin(worst, axis=1)                       # [B]
    axis = dirs[best]                                      # [B, 3]
    origin = jnp.take_along_axis(lo_proj, best[:, None], axis=1)[:, 0] - 1.0
    return axis, origin


def radius_neighbors_sorted(
    q_level: SortedLevel,
    s_level: SortedLevel,
    radius,
    *,
    max_k: int,
    query_tile: int,
    band_cap: int,
    interpret: bool = False,
    raw_positions: bool = False,
    with_threshold: bool = False,
) -> tuple[jax.Array, ...]:
    """Pallas band search over pre-sorted levels (same contract as
    :func:`radius_neighbors_pallas`, ~zero per-call XLA preprocessing).

    ``with_threshold=True`` (requires ``raw_positions``) additionally
    returns per-query selection thresholds ``(thr [Nq] f32, ptie [Nq] f32)``
    reproducing list membership EXACTLY without the list: a support at
    squared distance d2 and sorted position p is in the query's list iff
    ``d2 < thr or (d2 == thr and p <= ptie)``. thr is the K-th neighbor's
    squared distance (r^2 when the list isn't full — then every in-radius
    point is listed); ptie is the largest in-list position among entries at
    exactly thr (the select kernel extracts equal distances in ascending
    position order, so in-list ties are precisely the smallest positions).
    """
    from d3feat_tpu.ops.pallas.select import band_select

    r = jnp.asarray(radius, jnp.float32)
    nq, ns = q_level.n, s_level.n
    assert s_level.band_pad >= band_cap, "level band_pad < band_cap"
    shadow = jnp.int32(ns)

    pad = (-nq) % query_tile
    qk_p = jnp.pad(q_level.key_sorted, (0, pad),
                   constant_values=(q_level.num_clouds + 1) * SortedLevel.KOFF)
    q_packed = q_level.q_packed
    if pad:
        q_packed = jnp.pad(q_packed, ((0, 0), (0, pad)))
        q_packed = q_packed.at[3, nq:].set(-1.0)  # padding cid
    n_tiles = qk_p.shape[0] // query_tile

    tiles = qk_p.reshape(n_tiles, query_tile)
    tvalid = tiles < q_level.num_clouds * SortedLevel.KOFF
    kmin = jnp.min(jnp.where(tvalid, tiles, jnp.float32(3.0e37)), axis=1)
    kmax = jnp.max(jnp.where(tvalid, tiles, jnp.float32(-1.0)), axis=1)
    margin = r + SortedLevel.EPS
    # left insertion points via broadcast compare-count: n_tiles is tiny
    # (nq / T <= ~128), so [n_tiles, ns] compares are ~free, while
    # searchsorted(method='sort') re-sorts the whole support key array per
    # call (~1.2 ms/step across the pyramid's searches)
    starts = jnp.sum(
        s_level.key_sorted[None, :] < (kmin - margin)[:, None], axis=1
    ).astype(jnp.int32)
    ends = jnp.sum(
        s_level.key_sorted[None, :] < (kmax + margin)[:, None], axis=1
    ).astype(jnp.int32)
    # 8-row floor: bf16 HBM arrays are (8,128)-tiled and the band-conv DMA
    # start must be provably 8-divisible; band_conv floors identically so
    # the select and conv windows coincide (flooring only widens downward).
    # Level capacities are multiples of 8, so min(.) preserves alignment.
    starts = jnp.minimum((starts // 8) * 8, ns)
    overflow = jnp.any((ends - starts) > band_cap)

    sel = band_select(
        q_packed, s_level.s_packed, starts, r * r, ends,
        max_k=min(max_k, band_cap), band_cap=band_cap,
        query_tile=query_tile, interpret=interpret,
        with_dists=with_threshold,
    )
    pos, dists = sel if with_threshold else (sel, None)
    if raw_positions:
        # sorted-space contract: rows stay in sorted-query order and values
        # are sorted-support POSITIONS (shadow/empty -> ns). Skips two
        # [Nq, K] gathers (the orig-index translation and the inv reorder)
        # that cost ~ms each at 16k x 40.
        out = jnp.minimum(pos[:nq], ns)
        if out.shape[1] < max_k:
            out = jnp.pad(out, ((0, 0), (0, max_k - out.shape[1])),
                          constant_values=ns)
        if with_threshold:
            # thr: the last (K-th) squared distance; +inf when the list
            # isn't full -> clamp to r^2 (every in-radius point is listed).
            # ptie: the largest in-list position among entries at exactly
            # thr (empty slots carry d=+inf != thr since thr <= r^2 < inf).
            thr = jnp.minimum(dists[:nq, -1], (r * r).astype(jnp.float32))
            ptie = jnp.max(
                jnp.where(dists[:nq] == thr[:, None],
                          pos[:nq].astype(jnp.float32),
                          jnp.float32(-1.0)),
                axis=1,
            )
            return out, overflow, thr, ptie
        return out, overflow
    out_sorted = s_level.idx_sorted_pad[
        jnp.minimum(pos[:nq], ns + s_level.band_pad - 1)
    ]
    if out_sorted.shape[1] < max_k:
        out_sorted = jnp.pad(
            out_sorted, ((0, 0), (0, max_k - out_sorted.shape[1])),
            constant_values=ns)
    return out_sorted[q_level.inv], overflow


@functools.partial(
    jax.jit,
    static_argnames=("max_k", "num_clouds", "query_tile", "cell_capacity"),
)
def radius_neighbors_grid(
    queries: jax.Array,
    supports: jax.Array,
    q_lengths: jax.Array,
    s_lengths: jax.Array,
    radius: jax.Array | float,
    *,
    max_k: int,
    num_clouds: int,
    query_tile: int = 1024,
    cell_capacity: int = 32,
) -> tuple[jax.Array, jax.Array]:
    """Cell-grid radius search: same contract as :func:`radius_neighbors`,
    O(local density) per query instead of O(Ns).

    Supports are bucketed into cubic cells of edge ``radius`` (the uniform
    grid a TPU prefers over the reference's per-cloud KD-trees,
    neighbors.cpp:211-332): sort by packed (cloud, z, y, x) cell key once,
    then each query binary-searches its 27 neighboring cells and ranks at
    most ``27 * cell_capacity`` exact-arithmetic candidates — versus ranking
    all Ns in the brute path. Cells hold at most ``cell_capacity``
    candidates; the returned ``overflow`` flag reports if any occupied cell
    exceeded that (increase the capacity — dropped candidates would
    otherwise silently weaken neighbor lists).

    Returns (neighbors [Nq, max_k] int32, overflow []).
    """
    nq, ns = queries.shape[0], supports.shape[0]
    shadow = jnp.int32(ns)
    r = jnp.asarray(radius, jnp.float32)
    r2 = r * r

    q_cid = lengths_to_cloud_ids(q_lengths, nq)
    s_cid = lengths_to_cloud_ids(s_lengths, ns)
    q_valid = q_cid < num_clouds
    s_valid = s_cid < num_clouds

    # Joint per-cloud origin so query and support cell coords align.
    def seg_min(pts, cid, valid):
        big = jnp.float32(3.0e37)
        masked = jnp.where(valid[:, None], pts, big)
        return jax.ops.segment_min(
            masked, jnp.minimum(cid, num_clouds - 1), num_segments=num_clouds
        )

    origin = jnp.minimum(
        seg_min(queries, q_cid, q_valid), seg_min(supports, s_cid, s_valid)
    )  # [B, 3]

    _AX = 1024  # cells per axis (10 bits); scans are far smaller than AX * r

    def cell_of(pts, cid, valid):
        o = origin[jnp.minimum(cid, num_clouds - 1)]
        c = jnp.floor((pts - o) / r).astype(jnp.int32)
        # +1 so a query's "-1" probe offset stays in range without clamping
        c = jnp.clip(c + 1, 0, _AX - 1)
        return jnp.where(valid[:, None], c, _AX - 1)

    s_cell = cell_of(supports, s_cid, s_valid)

    def pack(cid, cell):
        k = cid.astype(jnp.uint32)
        for ax in range(3):
            k = k * _AX + cell[:, ax].astype(jnp.uint32)
        return k

    s_key = pack(jnp.where(s_valid, s_cid, num_clouds), s_cell)
    order = jnp.argsort(s_key)
    sk = s_key[order]                      # [Ns] sorted cell keys
    sp = supports[order].astype(jnp.float32)
    sidx = order.astype(jnp.int32)

    # cell-occupancy overflow detection (run lengths of the sorted keys)
    is_first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    run_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    run_len = jax.ops.segment_sum(
        s_valid[order].astype(jnp.int32), run_id, num_segments=ns
    )
    overflow = jnp.max(run_len) > cell_capacity

    q_cell = cell_of(queries, q_cid, q_valid)
    q_key_cid = jnp.where(q_valid, q_cid, num_clouds + 1)  # never matches

    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(-1, 2)] * 3), indexing="ij"), axis=-1
    ).reshape(27, 3)  # [27, 3]

    m = cell_capacity
    pad = (-nq) % query_tile
    qc_p = jnp.pad(q_cell, ((0, pad), (0, 0)))
    qcid_p = jnp.pad(q_key_cid, (0, pad), constant_values=num_clouds + 1)
    qp_p = jnp.pad(queries.astype(jnp.float32), ((0, pad), (0, 0)))
    n_tiles = qc_p.shape[0] // query_tile

    def one_tile(args):
        qc, qcid, qp = args  # [T,3] int32, [T], [T,3] f32
        ncell = qc[:, None, :] + offs[None, :, :]           # [T, 27, 3]
        key = qcid[:, None].astype(jnp.uint32)
        for ax in range(3):
            key = key * _AX + ncell[:, :, ax].astype(jnp.uint32)
        start = jnp.searchsorted(sk, key.reshape(-1)).reshape(key.shape)
        pos = start[:, :, None] + jnp.arange(m)[None, None, :]  # [T,27,m]
        pos_c = jnp.minimum(pos, ns - 1)
        hit = (jnp.take(sk, pos_c.reshape(-1)).reshape(pos.shape)
               == key[:, :, None]) & (pos < ns)
        cand = jnp.take(sp, pos_c.reshape(-1), axis=0).reshape(
            query_tile, 27 * m, 3
        )
        hit = hit.reshape(query_tile, 27 * m)
        diff = cand - qp[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)                   # [T, 27m]
        d2 = jnp.where(hit & (d2 <= r2), d2, _INF)
        k = min(max_k, 27 * m)
        neg, sel = jax.lax.top_k(-d2, k)                     # ascending d2
        keep = neg > -_INF
        cand_idx = jnp.take(sidx, jnp.minimum(pos_c.reshape(
            query_tile, 27 * m), ns - 1), axis=0)
        idx = jnp.take_along_axis(
            cand_idx.reshape(query_tile, 27 * m), sel, axis=1
        )
        idx = jnp.where(keep, idx, shadow)
        if k < max_k:
            idx = jnp.pad(idx, ((0, 0), (0, max_k - k)), constant_values=ns)
        return idx.astype(jnp.int32)

    out = jax.lax.map(
        one_tile,
        (
            qc_p.reshape(n_tiles, query_tile, 3),
            qcid_p.reshape(n_tiles, query_tile),
            qp_p.reshape(n_tiles, query_tile, 3),
        ),
    )
    return out.reshape(-1, max_k)[:nq], overflow


def count_in_radius(
    queries: jax.Array,
    supports: jax.Array,
    q_lengths: jax.Array,
    s_lengths: jax.Array,
    radius: jax.Array | float,
    *,
    num_clouds: int,
    query_tile: int = 1024,
) -> jax.Array:
    """[Nq] int32 number of supports within ``radius`` of each query.

    Used by offline neighbor-cap calibration (the static analogue of the
    reference's histogram calibration, datasets/dataloader.py:191-223).
    """
    nq, ns = queries.shape[0], supports.shape[0]
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    q_cid = lengths_to_cloud_ids(q_lengths, nq)
    q_cid = jnp.where(q_cid < num_clouds, q_cid, -1)
    s_cid = lengths_to_cloud_ids(s_lengths, ns)

    pad = (-nq) % query_tile
    q_p = jnp.pad(queries.astype(jnp.float32), ((0, pad), (0, 0)))
    qcid_p = jnp.pad(q_cid, (0, pad), constant_values=-1)
    n_tiles = q_p.shape[0] // query_tile
    sc = supports.astype(jnp.float32)
    s_sq = jnp.sum(sc * sc, axis=1)

    def one_tile(args):
        qt, qt_cid = args
        q_sq = jnp.sum(qt * qt, axis=1)
        d2 = q_sq[:, None] - 2.0 * (qt @ sc.T) + s_sq[None, :]
        ok = (qt_cid[:, None] == s_cid[None, :]) & (d2 <= r2)
        return jnp.sum(ok, axis=1).astype(jnp.int32)

    out = jax.lax.map(
        one_tile,
        (q_p.reshape(n_tiles, query_tile, 3), qcid_p.reshape(n_tiles, query_tile)),
    )
    return out.reshape(-1)[:nq]


@jax.custom_vjp
def permute_rows(x, perm, perm_inv):
    """``x[perm]`` for a PERMUTATION ``perm`` with known inverse.

    XLA's transpose of a gather is a scatter-add (~ms flat on TPU); for a
    bijective index map the cotangent is just the inverse gather, so this
    keeps the band-conv backward scatter-free. ``perm_inv`` must satisfy
    ``perm[perm_inv[j]] == j`` (e.g. ``argsort(perm)``)."""
    return jnp.take(x, perm, axis=0)


def _permute_rows_fwd(x, perm, perm_inv):
    return jnp.take(x, perm, axis=0), perm_inv


def _permute_rows_bwd(perm_inv, g):
    return jnp.take(g, perm_inv, axis=0), None, None


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)
