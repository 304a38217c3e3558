"""KPCNN classification family: forward shapes, loss, accuracy, training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_pair
from d3feat_tpu.data.synthetic import synthetic_fragment
from d3feat_tpu.models.kpcnn import (
    apply_kpcnn,
    classification_architecture,
    init_kpcnn,
    kpcnn_accuracy,
    kpcnn_loss,
    make_kpcnn_specs,
)
from d3feat_tpu.ops import build_pyramid, make_pyramid_spec


def tiny_config():
    cfg = D3FeatConfig()
    cfg.num_layers = 2
    cfg.first_features_dim = 16
    cfg.first_subsampling_dl = 0.1
    cfg.num_classes = 5
    cfg.caps = PyramidCaps(points=(512, 256), neighbors=(16, 16), corr=8)
    cfg.query_tile = 128
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    rng = np.random.default_rng(0)
    n = 200
    pts0 = synthetic_fragment(rng, n, extent=2.0)
    pts1 = synthetic_fragment(rng, n, extent=2.0) + 0.1
    packed = pack_pair(
        pts0, pts1, np.ones((n, 1), np.float32), np.ones((n, 1), np.float32),
        None, None, point_capacity=512, corr_capacity=8,
    )
    spec = make_pyramid_spec(cfg, num_clouds=2)
    batch = dict(build_pyramid(jnp.asarray(packed.points),
                               jnp.asarray(packed.lengths), spec=spec))
    batch["features"] = jnp.asarray(packed.features)
    params, state, specs = init_kpcnn(jax.random.key(0), cfg)
    return cfg, params, state, specs, batch


def test_arch_ends_in_global_average():
    arch = classification_architecture(3)
    assert arch[-1] == "global_average"
    assert arch.count("resnetb_strided") == 2


def test_forward_per_cloud_logits(setup):
    cfg, params, state, specs, batch = setup
    logits, _, auxes = apply_kpcnn(params, state, batch, cfg, specs)
    assert logits.shape == (2, cfg.num_classes)  # one row per stacked cloud
    assert np.isfinite(np.asarray(logits)).all()
    assert auxes == []  # rigid blocks only


def test_loss_and_accuracy(setup):
    cfg, params, state, specs, batch = setup
    logits, _, auxes = apply_kpcnn(params, state, batch, cfg, specs)
    labels = jnp.array([1, 3])
    loss, ce = kpcnn_loss(logits, labels, auxes, cfg)
    assert np.isfinite(float(loss)) and float(loss) == float(ce)
    acc = kpcnn_accuracy(logits, labels)
    assert 0.0 <= float(acc) <= 1.0


def test_kpcnn_trains(setup):
    """A few SGD steps on a fixed batch must reduce the CE loss."""
    cfg, params, state, specs, batch = setup
    labels = jnp.array([0, 2])

    def loss_fn(p):
        logits, _, auxes = apply_kpcnn(p, state, batch, cfg, specs, train=True)
        return kpcnn_loss(logits, labels, auxes, cfg)[0]

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    losses = []
    for _ in range(5):
        loss, g = grad_fn(params)
        params = jax.tree.map(lambda p, gi: p - 0.05 * gi, params, g)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
