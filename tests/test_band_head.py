"""Detector-head band kernel vs the XLA head (interpret mode, CPU).

The serving path replaces the [C0, K0, D] neighbor gather + two reductions
inside ``detection_scores`` (reference: models/architectures.py:322-358)
with the fused band-head kernel (ops/pallas/head.band_head), which
reproduces the calibrated K-truncated neighbor list via per-query selection
thresholds. These tests pin the two formulations to each other on the SAME
sorted-space pyramid: the neighborhood COUNT must be bit-identical (it is a
pure count of selected active rows) and scores must agree to
fp-accumulation level. A real-Mosaic duplicate lives in
tests_tpu/test_band_head_hw.py.
"""

import numpy as np
import jax.numpy as jnp
import jax
import pytest

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_pair
from d3feat_tpu.data.synthetic import synthetic_pair
from d3feat_tpu.models.kpfcnn import detection_scores
from d3feat_tpu.ops import build_pyramid, make_pyramid_spec


def _band_pyramid(seed=3, n=220, cap=512, num_layers=2):
    import dataclasses

    cfg = D3FeatConfig()
    cfg.num_layers = num_layers
    cfg.first_features_dim = 16
    cfg.first_subsampling_dl = 0.1
    cfg.caps = PyramidCaps(points=(cap, cap // 2), neighbors=(14, 14),
                           corr=8)
    cfg.query_tile = 128

    rng = np.random.default_rng(seed)
    pts0, pts1, corr, dk = synthetic_pair(rng, n_points=n, num_corr=8,
                                          extent=2.0)
    packed = pack_pair(
        pts0, pts1, np.ones((n, 1), np.float32), np.ones((n, 1), np.float32),
        corr, dk, point_capacity=cap, corr_capacity=8,
    )
    spec = make_pyramid_spec(cfg, num_clouds=2)
    spec = dataclasses.replace(spec, force_band_export=True)
    pyr = dict(build_pyramid(jnp.asarray(packed.points),
                             jnp.asarray(packed.lengths), spec=spec))
    assert not bool(pyr["overflow"])
    return cfg, pyr


def test_band_head_scores_match_xla_head():
    cfg, pyr = _band_pyramid()
    # the interpret-mode fused search must export the selection thresholds
    # the band head is gated on (this was the round-3 test hole: sel_thr
    # existed only on the real-TPU path, so CPU runs never hit the kernel)
    assert "conv0" in pyr["sel_thr"], "sel_thr not exported off-TPU"
    assert 0 in pyr["band"]

    # random descriptor-like features in the pyramid's sorted space;
    # padding rows zero (the head relies on that for count semantics)
    rng = np.random.default_rng(11)
    c0 = pyr["points"][0].shape[0]
    f = rng.uniform(0.0, 1.0, size=(c0, 32)).astype(np.float32)
    f = jnp.asarray(f) * pyr["masks"][0][:, None]

    scores_band = detection_scores(pyr, f, train=False, config=cfg)

    pyr_plain = dict(pyr)
    pyr_plain["band"] = {}
    pyr_plain["sel_thr"] = {}
    scores_xla = detection_scores(pyr_plain, f, train=False, config=cfg)

    np.testing.assert_allclose(np.asarray(scores_band),
                               np.asarray(scores_xla), atol=1e-6)


def test_band_head_count_semantics_with_zero_rows():
    """The reference counts neighbors whose FEATURE ROW is nonzero
    (architectures.py:347-349) — not list slots. Zero a few valid rows and
    require the mean denominators (and scores) still to agree."""
    cfg, pyr = _band_pyramid(seed=5)
    rng = np.random.default_rng(7)
    c0 = pyr["points"][0].shape[0]
    f = rng.uniform(0.0, 1.0, size=(c0, 32)).astype(np.float32)
    total = int(np.sum(np.asarray(pyr["lengths"][0])))
    zero_rows = rng.choice(total, size=total // 5, replace=False)
    f[zero_rows] = 0.0
    f = jnp.asarray(f) * pyr["masks"][0][:, None]

    scores_band = detection_scores(pyr, f, train=False, config=cfg)
    pyr_plain = dict(pyr)
    pyr_plain["band"] = {}
    pyr_plain["sel_thr"] = {}
    scores_xla = detection_scores(pyr_plain, f, train=False, config=cfg)
    np.testing.assert_allclose(np.asarray(scores_band),
                               np.asarray(scores_xla), atol=1e-6)


def test_band_head_train_grad_matches_xla():
    """The training path rides the band head through its custom VJP
    (config.bandhead_train): value AND gradient must match the XLA
    gather formulation on the same pyramid. The backward is one
    transposed band sweep (dx[r] = sum_t sel[r,t] g[t]); the neighbor
    count's cotangent is zero in both formulations (it is a count of
    nonzero rows)."""
    cfg, pyr = _band_pyramid(seed=9)
    rng = np.random.default_rng(13)
    c0 = pyr["points"][0].shape[0]
    f = jnp.asarray(
        rng.uniform(0.0, 1.0, size=(c0, 32)).astype(np.float32)
    ) * pyr["masks"][0][:, None]

    # weighted sum so the cotangent is non-uniform across rows/channels
    w = jnp.asarray(rng.normal(size=(c0, 1)).astype(np.float32))

    def loss_band(ff):
        return jnp.sum(w * detection_scores(pyr, ff, train=True,
                                            config=cfg))

    pyr_plain = dict(pyr)
    pyr_plain["band"] = {}
    pyr_plain["sel_thr"] = {}

    def loss_xla(ff):
        return jnp.sum(w * detection_scores(pyr_plain, ff, train=True,
                                            config=cfg))

    assert getattr(cfg, "bandhead_train", False)
    vb, gb = jax.value_and_grad(loss_band)(f)
    vx, gx = jax.value_and_grad(loss_xla)(f)
    np.testing.assert_allclose(float(vb), float(vx), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gx),
                               atol=1e-5, rtol=1e-5)
