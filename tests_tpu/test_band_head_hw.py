"""Band-head kernel vs XLA head on REAL TPU hardware (real Mosaic).

Same equality as tests/test_band_head.py, but the pyramid runs the real
fused select (search='pallas') and the head kernel compiles through Mosaic
instead of interpret mode. The serving path that produced the headline
bench numbers rides this kernel (models/kpfcnn.detection_scores); count
semantics must match the reference's nonzero-feature-row neighbor count
(reference: models/architectures.py:347-349).
"""

import numpy as np
import jax
import jax.numpy as jnp

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_pair
from d3feat_tpu.data.synthetic import synthetic_pair
from d3feat_tpu.models.kpfcnn import detection_scores
from d3feat_tpu.ops import build_pyramid, make_pyramid_spec


def test_band_head_scores_match_xla_head_on_hw():
    cfg = D3FeatConfig()
    cfg.num_layers = 2
    cfg.first_features_dim = 16
    cfg.first_subsampling_dl = 0.05
    cfg.caps = PyramidCaps(points=(2048, 1024), neighbors=(24, 24), corr=8)
    cfg.query_tile = 256
    cfg.neighbor_search = "pallas"

    rng = np.random.default_rng(3)
    n = 900
    pts0, pts1, corr, dk = synthetic_pair(rng, n_points=n, num_corr=8,
                                          extent=2.0)
    packed = pack_pair(
        pts0, pts1, np.ones((n, 1), np.float32), np.ones((n, 1), np.float32),
        corr, dk, point_capacity=2048, corr_capacity=8,
    )
    spec = make_pyramid_spec(cfg, num_clouds=2)
    pyr = dict(build_pyramid(jnp.asarray(packed.points),
                             jnp.asarray(packed.lengths), spec=spec))
    assert not bool(pyr["overflow"])
    assert "conv0" in pyr["sel_thr"] and 0 in pyr["band"]

    frng = np.random.default_rng(11)
    c0 = pyr["points"][0].shape[0]
    f = frng.uniform(0.0, 1.0, size=(c0, 32)).astype(np.float32)
    total = int(np.sum(np.asarray(pyr["lengths"][0])))
    f[frng.choice(total, size=total // 5, replace=False)] = 0.0  # zero rows
    f = jnp.asarray(f) * pyr["masks"][0][:, None]

    scores_band = detection_scores(pyr, f, train=False, config=cfg)
    pyr_plain = dict(pyr)
    pyr_plain["band"] = {}
    pyr_plain["sel_thr"] = {}
    scores_xla = detection_scores(pyr_plain, f, train=False, config=cfg)

    np.testing.assert_allclose(np.asarray(scores_band),
                               np.asarray(scores_xla), atol=1e-6)
