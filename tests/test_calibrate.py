"""Capacity calibration vs. observed pyramid statistics."""

import numpy as np
import pytest

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.calibrate import calibrate_caps
from d3feat_tpu.data.pack import pack_pair
from d3feat_tpu.data.synthetic import synthetic_pair


def test_calibrate_caps_reasonable():
    cfg = D3FeatConfig()
    cfg.num_layers = 3
    cfg.first_subsampling_dl = 0.08
    cfg.num_node = 24
    rng = np.random.default_rng(0)
    pairs = []
    for i in range(3):
        pts0, pts1, corr, dk = synthetic_pair(rng, n_points=300, num_corr=16,
                                              extent=2.0)
        p = pack_pair(pts0, pts1, np.ones((300, 1), np.float32),
                      np.ones((300, 1), np.float32), corr, dk,
                      point_capacity=1024, corr_capacity=24)
        pairs.append({"points": p.points, "lengths": p.lengths})
    caps = calibrate_caps(pairs, cfg)
    assert caps.num_levels == 3
    assert caps.corr == 24
    # level-0 point cap covers the stacked pair with headroom
    assert caps.points[0] >= 600
    # monotone decreasing level sizes
    assert caps.points[0] > caps.points[1] > caps.points[2] >= 1
    # neighbor caps positive and bounded by cloud size
    assert all(1 <= n <= 600 for n in caps.neighbors)
    # the 80th-percentile semantics: caps are far below the worst case
    assert caps.neighbors[0] < 300
