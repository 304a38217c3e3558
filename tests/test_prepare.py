"""Dataset preparation: correspondences + pickle layout round-trip."""

import os

import numpy as np
import pytest

from d3feat_tpu.data.ply import write_ply
from d3feat_tpu.data.prepare import compute_correspondences, prepare_split
from d3feat_tpu.data.threedmatch import ThreeDMatchPairDataset
from d3feat_tpu.eval.gtlog import save_gt_log


def _rot(rng):
    r = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    if np.linalg.det(r) < 0:
        r[:, 0] *= -1
    return r


def test_compute_correspondences_exact():
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 2, size=(300, 3))
    rot, t = _rot(rng), rng.normal(size=3) * 0.2
    # tgt in its own frame; pose maps tgt -> src frame
    tgt = (src - t) @ rot
    trans = np.eye(4)
    trans[:3, :3] = rot
    trans[:3, 3] = t
    corr = compute_correspondences(src, tgt, trans, 0.05)
    assert len(corr) == 300
    np.testing.assert_array_equal(corr[:, 0], corr[:, 1])


def test_prepare_split_and_train_dataset(tmp_path):
    rng = np.random.default_rng(1)
    scene = "synth-scene"
    frag_dir = tmp_path / "fragments" / scene
    os.makedirs(frag_dir)

    world = rng.uniform(0, 2, size=(2000, 3))
    poses = {}
    frames = []
    for i in range(3):
        rot, t = _rot(rng), rng.normal(size=3) * 0.1
        frames.append((rot, t))
        local = ((world - t) @ rot).astype(np.float32)
        write_ply(str(frag_dir / f"cloud_bin_{i}.ply"), [local], ["x", "y", "z"])
    for i in range(3):
        for j in range(i + 1, 3):
            ri, ti = frames[i]
            rj, tj = frames[j]
            gt = np.eye(4)
            gt[:3, :3] = ri.T @ rj
            gt[:3, 3] = (tj - ti) @ ri
            poses[f"{i}_{j}"] = gt
    save_gt_log(str(frag_dir / "gt.log"), poses)

    pts_path, kp_path = prepare_split(
        str(tmp_path), [scene], split="train", downsample=0.05
    )
    assert os.path.exists(pts_path) and os.path.exists(kp_path)

    ds = ThreeDMatchPairDataset(str(tmp_path), split="train", num_node=32,
                                downsample=0.05)
    assert len(ds) >= 1
    pts0, pts1, f0, f1, corr, dk = ds.get_pair(0)
    assert corr.shape[1] == 2 and len(corr) <= 32
    assert dk.shape == (len(corr), len(corr))
    packed = ds.packed(0, point_capacity=4096, corr_capacity=32)
    assert packed.points.shape == (4096, 3)
