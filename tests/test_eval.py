"""Registration-eval tests: gt.log round-trip, mutual-NN, scene recall.

Hermetic: synthetic fragments with known poses stand in for 3DMatch
(SURVEY.md §4 anchors: the checked-in gt_result data format enables a
fixture-driven registration test given stored descriptors).
"""

import os

import numpy as np
import pytest

from d3feat_tpu.eval import (
    FragmentFeatures,
    evaluate_scenes,
    inlier_stats,
    load_gt_log,
    mutual_nn,
    mutual_nn_numpy,
    register_scene,
    save_gt_log,
    select_keypoints,
)


def _unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_gtlog_roundtrip(tmp_path):
    poses = {
        "0_1": np.eye(4) + 0.01 * np.arange(16).reshape(4, 4),
        "2_5": np.linalg.qr(np.random.default_rng(0).normal(size=(4, 4)))[0],
    }
    p = tmp_path / "gt.log"
    save_gt_log(str(p), poses, num_frags=7)
    loaded = load_gt_log(str(tmp_path))
    assert set(loaded) == set(poses)
    for k in poses:
        np.testing.assert_allclose(loaded[k], poses[k], atol=1e-6)


def test_mutual_nn_identity():
    rng = np.random.default_rng(0)
    desc = _unit(rng.normal(size=(50, 32)))
    corr = mutual_nn_numpy(desc, desc)
    assert len(corr) == 50
    np.testing.assert_array_equal(corr[:, 0], corr[:, 1])


def test_mutual_nn_device_matches_numpy():
    rng = np.random.default_rng(1)
    s = _unit(rng.normal(size=(64, 32)))
    t = _unit(rng.normal(size=(80, 32)))
    a = mutual_nn_numpy(s, t)
    b = mutual_nn(s, t)
    np.testing.assert_array_equal(a, b)


def test_select_keypoints_top_scores():
    scores = np.array([0.1, 0.9, 0.5, 0.7, 0.2])
    idx = select_keypoints(scores, 2)
    assert set(idx) == {1, 3}


def test_select_keypoints_short_guard():
    # fewer positive scores than k: the top-k tail is arbitrary zero-score
    # points and (under eval_gate_topm) the gate's exactness argument is
    # void for this fragment — select_keypoints must surface it
    import warnings

    import pytest

    scores = np.array([0.0, 0.9, 0.0, 0.7, 0.0])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        idx = select_keypoints(scores, 2)  # 2 positives: exact, no warning
        assert set(idx) == {1, 3}
    with pytest.warns(RuntimeWarning, match="positive-score"):
        select_keypoints(scores, 3)
    with pytest.raises(RuntimeError, match="positive-score"):
        select_keypoints(scores, 3, on_short="raise")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        select_keypoints(scores, 3, on_short="ignore")


def test_inlier_stats_exact_pose():
    rng = np.random.default_rng(2)
    src = rng.normal(size=(30, 3))
    rot = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    if np.linalg.det(rot) < 0:
        rot[:, 0] *= -1
    trans = np.array([0.3, -0.2, 0.1])
    # target = inverse-transformed source; gt pose maps target -> source
    tgt = (src - trans) @ rot
    gt = np.eye(4)
    gt[:3, :3] = rot
    gt[:3, 3] = trans
    corr = np.stack([np.arange(30), np.arange(30)], axis=1)
    n, ratio = inlier_stats(src, tgt, corr, gt, 0.10)
    assert n == 30 and ratio == 1.0


def _make_scene(rng, n_frag=3, n_pts=120, d=32):
    """Fragments sharing one global point set; descriptors are noisy copies
    of per-point signatures, so mutual-NN recovers the true matching."""
    world = rng.normal(size=(n_pts, 3))
    sigs = _unit(rng.normal(size=(n_pts, d)))
    feats = FragmentFeatures()
    poses = {}
    frames = []
    for f in range(n_frag):
        rot = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        if np.linalg.det(rot) < 0:
            rot[:, 0] *= -1
        t = rng.normal(size=3)
        frames.append((rot, t))
        local = (world - t) @ rot  # world = local @ rot.T + t
        desc = _unit(sigs + 0.02 * rng.normal(size=sigs.shape))
        feats.add(f, local, desc, rng.random(n_pts))
    for i in range(n_frag):
        for j in range(i + 1, n_frag):
            # pose mapping fragment j coords into fragment i coords:
            # local_i = local_j @ (R_j^T R_i) + (t_j - t_i) @ R_i, and
            # inlier_stats applies frag2 = t @ gt[:3,:3].T + gt[:3,3]
            ri, ti = frames[i]
            rj, tj = frames[j]
            gt = np.eye(4)
            gt[:3, :3] = ri.T @ rj
            gt[:3, 3] = (tj - ti) @ ri
            poses[f"{i}_{j}"] = gt
    return feats, poses


def test_register_scene_perfect_features():
    rng = np.random.default_rng(3)
    feats, poses = _make_scene(rng)
    res = register_scene(feats, poses, scene="synthetic", num_points=100)
    assert res.gt_pairs == 3
    assert res.recall == 100.0
    assert res.avg_inlier_ratio > 0.5


def test_register_scene_random_features_fail():
    rng = np.random.default_rng(4)
    feats, poses = _make_scene(rng)
    # destroy the descriptors: recall should collapse
    for f in feats.descriptors:
        feats.descriptors[f] = _unit(rng.normal(size=feats.descriptors[f].shape))
    res = register_scene(feats, poses, scene="broken", num_points=100)
    assert res.recall < 100.0
    assert res.avg_inlier_ratio < 0.2


def test_evaluate_scenes_and_disk_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    feats, poses = _make_scene(rng)
    scene = "scene-a"
    os.makedirs(tmp_path / f"{scene}-evaluation")
    save_gt_log(str(tmp_path / f"{scene}-evaluation" / "gt.log"), poses)

    feats.save(str(tmp_path / "features"), scene)
    reloaded = FragmentFeatures.load(str(tmp_path / "features"), scene)
    assert reloaded.num_fragments == feats.num_fragments

    results, summary = evaluate_scenes(
        {scene: reloaded}, str(tmp_path), num_points=100
    )
    assert results[0].recall == 100.0
    assert summary["avg_recall"] == 100.0
