"""Batched multi-fragment extraction == single-fragment extraction."""

import numpy as np
import jax
import pytest

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.synthetic import synthetic_fragment
from d3feat_tpu.eval.extract import FeatureExtractor
from d3feat_tpu.train.step import init_train_state


@pytest.fixture(scope="module")
def model():
    cfg = D3FeatConfig()
    cfg.num_layers = 2
    cfg.first_features_dim = 16
    cfg.first_subsampling_dl = 0.1
    cfg.caps = PyramidCaps(points=(1024, 512), neighbors=(16, 16), corr=8)
    cfg.query_tile = 128
    ts, _ = init_train_state(jax.random.key(0), cfg)
    return cfg, ts


def test_batched_matches_single(model):
    cfg, ts = model
    rng = np.random.default_rng(0)
    clouds = [synthetic_fragment(rng, n, extent=2.0) for n in (300, 250, 280)]

    single = FeatureExtractor(cfg, ts.params, ts.model_state,
                              buckets=(512,), batch_fragments=1)
    batched = FeatureExtractor(cfg, ts.params, ts.model_state,
                               buckets=(512,), batch_fragments=3)
    res_s = single.extract_many(clouds)
    res_b = batched.extract_many(clouds)
    for (fs, ss), (fb, sb) in zip(res_s, res_b):
        assert fs.shape == fb.shape
        np.testing.assert_allclose(fs, fb, atol=2e-5)
        np.testing.assert_allclose(ss, sb, atol=2e-5)


def test_batched_remainder_group(model):
    cfg, ts = model
    rng = np.random.default_rng(1)
    clouds = [synthetic_fragment(rng, 200, extent=2.0) for _ in range(3)]
    ex = FeatureExtractor(cfg, ts.params, ts.model_state,
                          buckets=(512,), batch_fragments=2)
    res = ex.extract_many(clouds)  # groups of 2 then 1... last group size 1
    assert len(res) == 3
    for (f, s), c in zip(res, clouds):
        assert f.shape[0] == len(c)
        assert np.isfinite(f).all()
