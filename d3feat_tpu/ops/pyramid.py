"""On-device multi-scale pyramid construction.

One jitted XLA program replacing the reference's CPU collate pipeline
(reference: datasets/dataloader.py:69-189), which called the C++ grid
subsampler and nanoflann radius search inside every DataLoader worker (the
documented bottleneck: 353 s / 1000 batches single-worker,
dataloader.py:273). Here the full 5-level structure — per-level points,
conv neighbors, pool neighbors, nearest-upsample indices and stack lengths —
is built on the TPU from the raw stacked clouds.

Radius schedule (matching dataloader.py:88-171):
  r_0 = first_subsampling_dl * conv_radius, doubling per level;
  subsample voxel at level l -> l+1: dl = 2 * r_l / conv_radius;
  pool neighbors at r_l, upsample (nearest) at 2 * r_l;
  deformable layers scale the search radius by deform_radius / conv_radius.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from d3feat_tpu.ops.neighbors import (
    SortedLevel,
    make_level_frame,
    radius_neighbors,
    radius_neighbors_banded,
    radius_neighbors_grid,
    radius_neighbors_sorted,
)
from d3feat_tpu.ops.subsample import voxel_subsample, lengths_to_mask


@dataclass(frozen=True)
class PyramidSpec:
    """Static description of the pyramid (hashable => usable as jit static)."""

    num_levels: int
    first_subsampling_dl: float
    conv_radius: float
    point_caps: Tuple[int, ...]      # [L] per-level point capacity
    neighbor_caps: Tuple[int, ...]   # [L] per-level neighbor width
    conv_r_scale: Tuple[float, ...]  # [L] 1.0 or deform_radius/conv_radius
    pool_r_scale: Tuple[float, ...]  # [L-1 used] same, for strided blocks
    num_clouds: int = 2
    query_tile: int = 1024
    search: str = "banded"      # 'brute' | 'banded' | 'grid' | 'pallas'
    band_frac: float = 0.1      # band margin ~ 2*frac*rows/clouds (overflow-flagged)
    force_band_export: bool = False  # export band state off-TPU (interpret tests)
    cell_capacity: int = 32     # candidates kept per grid cell (grid)

    @property
    def radii(self) -> Tuple[float, ...]:
        r0 = self.first_subsampling_dl * self.conv_radius
        return tuple(r0 * (2.0**l) for l in range(self.num_levels))


def _round_up_256(n: int) -> int:
    return -(-n // 256) * 256


def level_band_cap(rows: int, num_clouds: int, band_frac: float,
                   tile: int = 128, ratio: int = 1) -> int:
    """Static band width for a support level (shared by the select and
    band-conv kernels so their windows coincide).

    ``ratio`` = ceil(support capacity / query capacity) of the search: a
    tile of T *query* rows spans ~T * ratio *support* rows along the sorted
    axis, so strided (pool) searches — queries are the subsampled level —
    need their band sized by the density ratio, not just the tile width.
    The capacity ratio UNDERESTIMATES the valid-row ratio (voxel-size
    doubling thins fused surface scans up to ~8x while capacity schedules
    halve), so strided ratios get a 4x allowance — pool searches are one
    per level transition, so the wider band is cheap relative to the conv
    searches. (Round 1 sized every band with ratio 1, silently truncating
    pool neighborhoods at realistic shapes.)"""
    eff = 1 if ratio <= 1 else 4 * ratio
    # 2048-row floor: the conv radius DOUBLES per level while rows shrink
    # 3-4x, so at deep levels the key window spans a large fraction of the
    # cloud and the frac model underestimates (measured: conv3 overflow on
    # ~1% of scan pairs). Since the chunked kernels' work rides the
    # per-tile actual ends — not the static cap — a generous cap only
    # widens the skip headroom; deep levels simply get the whole level.
    return min(rows, max(2048, _round_up_256(
        tile * eff + int(2 * band_frac * rows / num_clouds)
    )))


def make_pyramid_spec(config, num_clouds: int = 2) -> PyramidSpec:
    """Derive the static pyramid spec from a config + its architecture list.

    Walks the block list the way the reference collate does
    (dataloader.py:101-173) to decide, per level, whether the conv and pool
    searches use the deformable radius.
    """
    arch = config.architecture()
    deform_scale = config.deform_radius / config.conv_radius
    conv_scale: List[float] = []
    pool_scale: List[float] = []
    layer_blocks: List[str] = []
    for block_i, block in enumerate(arch):
        if "global" in block or "upsample" in block:
            break
        if not ("pool" in block or "strided" in block):
            layer_blocks.append(block)
            if block_i < len(arch) - 1 and "upsample" not in arch[block_i + 1]:
                continue
        if layer_blocks and any("deformable" in b for b in layer_blocks[:-1]):
            conv_scale.append(deform_scale)
        else:
            conv_scale.append(1.0)
        if "pool" in block or "strided" in block:
            pool_scale.append(deform_scale if "deformable" in block else 1.0)
        layer_blocks = []
    num_levels = len(conv_scale)
    caps = config.caps
    if caps.num_levels < num_levels:
        raise ValueError(
            f"caps define {caps.num_levels} levels but architecture needs {num_levels}"
        )
    return PyramidSpec(
        num_levels=num_levels,
        first_subsampling_dl=config.first_subsampling_dl,
        conv_radius=config.conv_radius,
        point_caps=tuple(caps.points[:num_levels]),
        neighbor_caps=tuple(caps.neighbors[:num_levels]),
        conv_r_scale=tuple(conv_scale),
        pool_r_scale=tuple(pool_scale) + (1.0,) * (num_levels - len(pool_scale)),
        num_clouds=num_clouds,
        query_tile=config.query_tile,
        search=getattr(config, "neighbor_search", "banded"),
        band_frac=getattr(config, "band_frac", 0.1),
        cell_capacity=getattr(config, "cell_capacity", 32),
    )


@functools.partial(jax.jit, static_argnames=("spec",))
def build_pyramid(
    points: jax.Array,
    lengths: jax.Array,
    *,
    spec: PyramidSpec,
) -> Dict[str, list]:
    """Build the full multi-scale structure for one stacked batch.

    Args:
      points: [C0, 3] stacked contiguous clouds, padded to spec.point_caps[0].
      lengths: [num_clouds] int32 valid counts.

    Returns a dict of per-level lists (mirroring the reference input dict,
    dataloader.py:178-187):
      points[l]    [C_l, 3]      shadow-padded coordinates
      neighbors[l] [C_l, K_l]    conv neighbor indices (shadow = C_l)
      pools[l]     [C_{l+1}, K_l] strided conv/pool indices into level l
      upsamples[l] [C_l, 1]      nearest level-(l+1) cell per level-l point
      lengths[l]   [B]           per-cloud valid counts
      masks[l]     [C_l]         validity
    """
    if points.shape[0] != spec.point_caps[0]:
        raise ValueError(
            f"points capacity {points.shape[0]} != spec {spec.point_caps[0]}"
        )
    L = spec.num_levels
    r0 = spec.first_subsampling_dl * spec.conv_radius

    out: Dict[str, list] = {
        "points": [], "neighbors": [], "pools": [], "upsamples": [],
        "lengths": [], "masks": [],
    }
    out["band"] = {}  # per-level sorted state for fused band kernels
    out["sel_thr"] = {}  # per-search (thr, ptie) threshold-selection pairs
    pts, lens = points.astype(jnp.float32), lengths.astype(jnp.int32)
    overflow = jnp.zeros((), bool)
    overflow_by = {}  # per-source flags (same info, diagnosable)

    want_pallas = spec.search == "pallas" and jax.default_backend() == "tpu"
    want_band = want_pallas or spec.force_band_export
    # sorted-space output: whenever band state is exported, every per-level
    # array (points, neighbor/pool/upsample lists) lives in the level's
    # key-sorted row order and neighbor values are sorted-support POSITIONS.
    # The sort is cloud-stable (key = cid * KOFF + proj), so the contiguous
    # valid-rows-first layout, lengths, masks and shadow conventions are
    # unchanged — but every sorted<->original translation gather (~ms each
    # at 16k x 40) disappears from the hot path. Callers re-map only the
    # input features, the correspondence rows and the final outputs via
    # band[0]['order']/'inv'.
    # (statically derivable by consumers: band dict non-empty <=> sorted)
    sorted_space = want_band
    sorted_levels: Dict[int, SortedLevel] = {}
    if want_band:
        frame_axis, frame_origin = make_level_frame(
            pts, lens, spec.num_clouds
        )

    def _level_ratio(l: int) -> int:
        # worst-case support/query density ratio for searches with level l
        # as support: the pool search from level l+1 (if any)
        if l + 1 < L:
            return -(-spec.point_caps[l] // spec.point_caps[l + 1])
        return 1

    def _band_for(l: int, s_rows: int) -> int:
        # pad for the widest search reading this level as support: the
        # conv search (tile 256, ratio 1) or the pool search from l+1
        # (tile 128 — smaller tiles keep the wider pool band inside the
        # 16 MB VMEM scope)
        return max(
            level_band_cap(s_rows, spec.num_clouds, spec.band_frac,
                           tile=256, ratio=1),
            level_band_cap(s_rows, spec.num_clouds, spec.band_frac,
                           tile=128, ratio=_level_ratio(l)),
        )

    def sorted_level(l: int, p, ln) -> SortedLevel:
        # one sort + one lane-packed layout per level, shared by every
        # conv/pool/upsample search touching the level; padded for the most
        # demanding (largest-ratio) search that reads the level
        if l not in sorted_levels:
            sorted_levels[l] = SortedLevel(
                p, ln, spec.num_clouds, frame_axis, frame_origin,
                band_pad=_band_for(l, p.shape[0]),
            )
        return sorted_levels[l]

    def to_sorted_space(idx_orig, lv_q, lv_s):
        """Original-order/original-index lists -> sorted rows + positions."""
        ext_inv = jnp.concatenate([
            lv_s.inv.astype(jnp.int32),
            jnp.full((1,), lv_s.n, jnp.int32),
        ])
        return ext_inv[jnp.minimum(idx_orig, lv_s.n)][lv_q.order]

    def search(q, s, ql, sl, r, k, q_level, s_level, name):
        nonlocal overflow
        ratio = -(-s.shape[0] // q.shape[0])  # >= 1 only for pool searches
        tile = min(spec.query_tile, q.shape[0])
        if s.shape[0] > q.shape[0]:
            # strided (pool) search: fewer queries than supports — shrink the
            # tile so its support band stays a bounded fraction of the level
            tile = max(128, (tile * q.shape[0]) // s.shape[0])
        # the fused select runs at EVERY level on TPU: the XLA brute
        # fallback's top_k lowers to full sorts costing ~7 ms of fixed
        # overhead per search (measured) — at small levels the band is
        # simply (nearly) the whole level and stays exact.
        # force_band_export takes the SAME path in Pallas interpret mode,
        # so CPU tests exercise the real selection + sel_thr export (the
        # band-head and threshold-mode band-conv gates) end to end.
        if want_pallas or spec.force_band_export:
            # pool bands are wide: smaller tiles bound [band, tile] panels.
            # Tiles must be 128-lane multiples (Mosaic block divisibility);
            # tiny eval buckets would otherwise yield e.g. 96-wide tiles.
            qt = 128 if (ratio > 1 or s.shape[0] < 256) else 256
            want_thr = k > 1  # conv/pool searches feed the band convolution
            res = radius_neighbors_sorted(
                sorted_level(q_level, q, ql), sorted_level(s_level, s, sl),
                r, max_k=k, query_tile=qt,
                band_cap=level_band_cap(s.shape[0], spec.num_clouds,
                                        spec.band_frac, tile=qt,
                                        ratio=ratio),
                raw_positions=True, with_threshold=want_thr,
                interpret=not want_pallas,
            )
            idx, ov = res[0], res[1]
            if want_thr:
                # per-query selection thresholds: the fused band conv (and
                # detector-head kernel) reproduce list membership from
                # (thr, ptie) alone — no [K, T] compare loop in-kernel
                out["sel_thr"][name] = (res[2], res[3])
            overflow = overflow | ov
            overflow_by[name] = ov
            return idx
        if (spec.search == "banded" or
                (spec.search == "pallas" and not want_pallas)) \
                and s.shape[0] > 4096:
            # a sorted query tile stays inside one cloud, so the band margin
            # scales with the PER-CLOUD row count, not the stacked total;
            # tile span + density ratio handled by the shared cap formula
            band = level_band_cap(
                s.shape[0], spec.num_clouds, spec.band_frac,
                tile=tile, ratio=ratio,
            )
            idx, ov = radius_neighbors_banded(
                q, s, ql, sl, r, max_k=k, num_clouds=spec.num_clouds,
                query_tile=tile, band_cap=band,
            )
            overflow = overflow | ov
            overflow_by[name] = ov
        elif spec.search == "grid":
            idx, ov = radius_neighbors_grid(
                q, s, ql, sl, r, max_k=k, num_clouds=spec.num_clouds,
                query_tile=tile, cell_capacity=spec.cell_capacity,
            )
            overflow = overflow | ov
            overflow_by[name] = ov
        else:
            idx = radius_neighbors(
                q, s, ql, sl, r, max_k=k, num_clouds=spec.num_clouds,
                query_tile=tile,
            )
        if sorted_space:  # CPU paths emit original order; convert
            idx = to_sorted_space(idx, sorted_level(q_level, q, ql),
                                  sorted_level(s_level, s, sl))
        return idx

    def export_level(l, p, ln):
        # arrays the fused band-conv kernel needs (ops/pallas/band_conv);
        # only exported on the pallas path, consumed inside the same trace
        if not want_band:
            return
        lvl = sorted_level(l, p, ln)
        out["band"][l] = {
            "key_sorted": lvl.key_sorted,
            "order": lvl.order,
            "inv": lvl.inv,
            "q_packed": lvl.q_packed,
            "s_packed": lvl.s_packed,
        }

    def emit_points(l, p, ln):
        if sorted_space:
            return sorted_level(l, p, ln).pts_sorted
        return p

    for l in range(L):
        r = r0 * (2.0**l)
        out["points"].append(emit_points(l, pts, lens))
        out["lengths"].append(lens)
        out["masks"].append(lengths_to_mask(lens, pts.shape[0]))
        export_level(l, pts, lens)
        out["neighbors"].append(
            search(pts, pts, lens, lens, r * spec.conv_r_scale[l],
                   spec.neighbor_caps[l], l, l, f"conv{l}")
        )
        if l + 1 < L:
            sub = voxel_subsample(
                pts, lens, 2.0 * r / spec.conv_radius,
                out_capacity=spec.point_caps[l + 1], num_clouds=spec.num_clouds,
                # dl doubles per level over points spaced >= previous dl:
                # occupancy is bounded ~(2+1)^3; 32 covers it with margin
                # (the overflow flag reports violations). Level 0's input
                # spacing comes from the dataset's host downsample (plus
                # augmentation noise), not from a previous pyramid level —
                # give it double the margin.
                occupancy_cap=64 if l == 0 else 32,
            )
            overflow = overflow | sub.overflow
            overflow_by[f"sub{l}"] = sub.overflow
            out["pools"].append(
                search(sub.points, pts, sub.lengths, lens,
                       r * spec.pool_r_scale[l], spec.neighbor_caps[l],
                       l + 1, l, f"pool{l}")
            )
            out["upsamples"].append(
                search(pts, sub.points, lens, sub.lengths, 2.0 * r, 1,
                       l, l + 1, f"up{l}")
            )
            pts, lens = sub.points, sub.lengths
    out["overflow"] = overflow
    out["overflow_by"] = overflow_by
    return out
