"""Portable .npz weight artifact round-trip (compat/portable.py).

The repo ships its trained model as a params-only compressed npz
(artifacts/); these tests pin that the artifact restores exactly into a
fresh ``init_train_state`` template and that a config mismatch fails
loudly rather than loading weights into the wrong block.
"""

import os

import numpy as np
import jax
import pytest

from d3feat_tpu.compat.portable import export_npz, import_npz
from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.train.step import init_train_state


def _cfg(num_layers=3, dim=32):
    cfg = D3FeatConfig()
    cfg.num_layers = num_layers
    cfg.first_features_dim = dim
    cfg.caps = PyramidCaps(points=(512,) * num_layers,
                           neighbors=(12,) * num_layers, corr=16)
    return cfg


def test_roundtrip_exact(tmp_path):
    cfg = _cfg()
    ts, _ = init_train_state(jax.random.key(0), cfg)
    path = os.path.join(tmp_path, "w.npz")
    export_npz(path, ts.params, ts.model_state,
               meta={"epoch": 7, "val_acc": 0.5})

    ts2, _ = init_train_state(jax.random.key(1), cfg)  # different init
    params, state, meta = import_npz(path, ts2.params, ts2.model_state)
    assert meta == {"epoch": 7, "val_acc": 0.5}
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ts.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(ts.model_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_architecture_mismatch_raises(tmp_path):
    ts, _ = init_train_state(jax.random.key(0), _cfg(num_layers=3))
    path = os.path.join(tmp_path, "w.npz")
    export_npz(path, ts.params, ts.model_state)
    other, _ = init_train_state(jax.random.key(0), _cfg(num_layers=4))
    with pytest.raises(ValueError):
        import_npz(path, other.params, other.model_state)
