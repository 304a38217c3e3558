"""Trainer / loader / checkpoint integration tests (synthetic data, tiny).

Covers the reference trainer's control-flow semantics
(reference: trainer.py:39-68 epoch loop + best snapshotting;
trainer.py:212-225 resume) plus the prefetching loader.
"""

import os

import numpy as np
import jax
import pytest

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.loader import PairLoader
from d3feat_tpu.data.synthetic import SyntheticPairDataset
from d3feat_tpu.train.checkpoint import SnapshotManager
from d3feat_tpu.train.trainer import Trainer


def tiny_config(tmp, num_devices=1):
    cfg = D3FeatConfig()
    cfg.num_layers = 2
    cfg.first_features_dim = 16
    cfg.first_subsampling_dl = 0.1
    cfg.caps = PyramidCaps(points=(512, 256), neighbors=(16, 16), corr=32)
    cfg.query_tile = 128
    cfg.max_epoch = 2
    cfg.training_max_iter = 3
    cfg.val_max_iter = 2
    cfg.snapshot_interval = 1
    cfg.snapshot_root = str(tmp)
    cfg.experiment_id = "test"
    cfg.num_devices = num_devices
    cfg.verbose = False
    return cfg


def make_loader(cfg, size=6, seed=0):
    ds = SyntheticPairDataset(size=size, n_points=200, num_corr=16, seed=seed)
    return PairLoader(
        ds, point_capacity=cfg.caps.points[0], corr_capacity=cfg.caps.corr,
        num_devices=cfg.num_devices, num_workers=2, seed=seed,
    )


def test_loader_shapes_and_count():
    cfg = tiny_config("/tmp/x", num_devices=2)
    loader = make_loader(cfg, size=6)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["points"].shape == (2, 512, 3)
    assert b["lengths"].shape == (2, 2)
    assert b["corr"].shape == (2, 32, 2)


def test_trainer_end_to_end_and_resume(tmp_path):
    cfg = tiny_config(tmp_path)
    trainer = Trainer(cfg, make_loader(cfg), make_loader(cfg, seed=1))
    state = trainer.train()
    assert int(state.step) > 0

    snap_dir = os.path.join(cfg.snapshot_root, cfg.experiment_id)
    assert os.path.isdir(os.path.join(snap_dir, "model_final"))
    assert os.path.isdir(os.path.join(snap_dir, "snapshot_epoch_2"))
    assert os.path.exists(os.path.join(snap_dir, "config.json"))
    # best snapshots exist (val ran)
    assert trainer.snapshots.exists("model_best_loss")

    # resume from the final snapshot: epoch pointer advances past max_epoch
    cfg2 = tiny_config(tmp_path)
    cfg2.pretrain = "model_final"
    trainer2 = Trainer(cfg2, make_loader(cfg2), None,
                       snapshot_dir=snap_dir)
    assert trainer2.start_epoch == cfg.max_epoch
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(trainer2.state.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )


def test_trainer_warmstart_from_npz(tmp_path):
    """pretrain=<path>.npz restores params/model_state + epoch/best-acc
    meta from a portable artifact (the committed reset-recovery path),
    leaving the optimizer state fresh."""
    from d3feat_tpu.compat.portable import export_npz

    cfg = tiny_config(tmp_path)
    donor = Trainer(cfg, make_loader(cfg), None)
    npz = os.path.join(tmp_path, "w.npz")
    export_npz(npz, donor.state.params, donor.state.model_state,
               meta={"epoch": 41, "best_loss": 2.45, "best_acc": 30.47})

    cfg2 = tiny_config(tmp_path)
    cfg2.pretrain = npz
    t2 = Trainer(cfg2, make_loader(cfg2), None)
    assert t2.start_epoch == 41
    assert t2.best_acc == pytest.approx(30.47)
    assert t2.best_loss == pytest.approx(2.45)
    for a, b in zip(jax.tree_util.tree_leaves(t2.state.params),
                    jax.tree_util.tree_leaves(donor.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_dp_runs(tmp_path):
    cfg = tiny_config(tmp_path, num_devices=4)
    cfg.max_epoch = 1
    trainer = Trainer(cfg, make_loader(cfg, size=8), None)
    res = trainer.train_epoch(0)
    assert np.isfinite(res["loss"])
    assert res["skipped"] == 0.0


def test_loader_propagates_worker_errors():
    """A dataset error inside the producer thread must surface to the
    consumer instead of leaving it blocked on the queue forever."""

    class Boom:
        def __len__(self):
            return 4

        def packed(self, index, *, point_capacity, corr_capacity):
            raise ValueError("synthetic failure")

    loader = PairLoader(
        Boom(), point_capacity=64, corr_capacity=8, num_workers=2,
        max_iter=2, seed=0,
    )
    with pytest.raises(ValueError, match="synthetic failure"):
        list(loader)
