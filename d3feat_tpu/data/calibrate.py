"""Offline capacity calibration: the static analogue of the reference's
per-run neighborhood calibration.

The reference recomputes neighbor-count histograms through its CPU collate
at every training/test startup and caps neighbor matrices at the
80th-percentile count (reference: datasets/dataloader.py:191-223,
keep_ratio=0.8, until >2000 samples per layer). On TPU those caps must be
static compile-time constants, so calibration runs once, offline, on
device, and its result is persisted in the config:

* per-level neighbor cap  = smallest k covering ``keep_ratio`` of queries,
* per-level point capacity = max observed subsampled count padded up to a
  friendly multiple with ``headroom``,
* correspondence capacity = config.num_node.

Returns a :class:`d3feat_tpu.config.PyramidCaps` to store in config.json.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from d3feat_tpu.config import PyramidCaps
from d3feat_tpu.ops.neighbors import count_in_radius
from d3feat_tpu.ops.subsample import voxel_subsample, lengths_to_mask


def _round_up(n: int, multiple: int = 256) -> int:
    return int(-(-n // multiple) * multiple)


def calibrate_caps(
    sample_pairs: Sequence[dict],
    config,
    *,
    keep_ratio: float = 0.8,
    headroom: float = 1.15,
    num_clouds: int = 2,
) -> PyramidCaps:
    """Derive static pyramid capacities from sample batches.

    Args:
      sample_pairs: dicts with ``points`` [C,3] (shadow-padded) and
        ``lengths`` [num_clouds] — e.g. packed training pairs.
      keep_ratio: quantile of per-query neighbor counts each cap must cover
        (reference: dataloader.py:217-220).
      headroom: multiplier on observed per-level point counts.
    """
    L = config.num_layers
    r0 = config.first_subsampling_dl * config.conv_radius
    hist_counts = [[] for _ in range(L)]
    max_points = [0] * L

    for batch in sample_pairs:
        pts = jnp.asarray(batch["points"], jnp.float32)
        lens = jnp.asarray(batch["lengths"], jnp.int32)
        for l in range(L):
            r = r0 * (2.0**l)
            n_total = int(jnp.sum(lens))
            max_points[l] = max(max_points[l], n_total)
            counts = count_in_radius(
                pts, pts, lens, lens, r, num_clouds=num_clouds,
                query_tile=min(1024, pts.shape[0]),
            )
            mask = np.asarray(lengths_to_mask(lens, pts.shape[0]))
            hist_counts[l].append(np.asarray(counts)[mask])
            if l + 1 < L:
                sub = voxel_subsample(
                    pts, lens, 2.0 * r / config.conv_radius,
                    out_capacity=pts.shape[0], num_clouds=num_clouds,
                )
                pts, lens = sub.points, sub.lengths

    neighbor_caps = []
    point_caps = []
    for l in range(L):
        counts = np.concatenate(hist_counts[l])
        cap = int(np.quantile(counts, keep_ratio, method="higher"))
        neighbor_caps.append(max(cap, 1))
        point_caps.append(_round_up(int(max_points[l] * headroom)))

    return PyramidCaps(
        points=tuple(point_caps),
        neighbors=tuple(neighbor_caps),
        corr=int(config.num_node),
    )
