"""Hermetic registration-eval test on the REAL vendored 3DMatch ground truth.

The repo vendors the standard 3DMatch geometric-registration benchmark
definition (``geometric_registration/gt_result/<scene>-evaluation/gt.log`` +
``gt.info`` — public benchmark data, same files the reference checks in at
reference: geometric_registration/gt_result/). These tests replay synthetic
descriptors through the full `evaluate_scenes` path against the real GT
poses, exercising the gt.log parser, keypoint selection, mutual-NN matching
and inlier counting on real pose data (reference protocol: test.py:20-82).

Fixture construction: 3DMatch GT poses are globally consistent (they come
from one fused reconstruction), so absolute fragment poses can be recovered
by propagating relative poses over a BFS spanning tree of the overlap graph.
Each fragment's keypoints are one shared world point set expressed in that
fragment's frame; corresponding world points get identical descriptors, so
mutual-NN matching recovers the true correspondences and every GT pair must
score ~100% inliers.
"""

import os

import numpy as np
import pytest

from d3feat_tpu.eval.gtlog import load_gt_log
from d3feat_tpu.eval.registration import (
    FragmentFeatures,
    evaluate_scenes,
    register_scene,
)

GT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "geometric_registration", "gt_result",
)

SCENES_8 = [
    "7-scenes-redkitchen",
    "sun3d-home_at-home_at_scan1_2013_jan_1",
    "sun3d-home_md-home_md_scan9_2012_sep_30",
    "sun3d-hotel_uc-scan3",
    "sun3d-hotel_umd-maryland_hotel1",
    "sun3d-hotel_umd-maryland_hotel3",
    "sun3d-mit_76_studyroom-76-1studyroom2",
    "sun3d-mit_lab_hj-lab_hj_tea_nov_2_2012_scan1_erika",
]


def test_gt_fixtures_present_for_all_8_scenes():
    """The repo-default --gt_root must resolve with gt.log for every scene
    (reference: test.py:205-214 scene list)."""
    for scene in SCENES_8:
        path = os.path.join(GT_ROOT, f"{scene}-evaluation", "gt.log")
        assert os.path.exists(path), path
        gt = load_gt_log(path)
        assert len(gt) > 50, f"{scene}: suspiciously few GT pairs"
        for key, pose in list(gt.items())[:3]:
            assert pose.shape == (4, 4)
            # rigid transform: orthonormal rotation, last row [0,0,0,1]
            R = pose[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)
            np.testing.assert_allclose(pose[3], [0, 0, 0, 1], atol=1e-8)


def _absolute_poses(gt, n):
    """Recover per-fragment absolute poses M_i (world -> frame i) by BFS over
    the relative constraints T_ij @ M_j == M_i."""
    M = {0: np.eye(4)}
    edges = {}
    for key, T in gt.items():
        i, j = map(int, key.split("_"))
        edges.setdefault(i, []).append((j, np.linalg.inv(T)))  # M_j = T^-1 M_i
        edges.setdefault(j, []).append((i, T))                 # M_i = T  M_j
    frontier = [0]
    while frontier:
        a = frontier.pop()
        for b, T in edges.get(a, []):
            if b not in M:
                M[b] = T @ M[a]
                frontier.append(b)
    for i in range(n):  # disconnected fragments: identity (never scored)
        M.setdefault(i, np.eye(4))
    return M


def _consistent_features(gt, n, num_world=250, desc_dim=32, seed=0):
    rng = np.random.default_rng(seed)
    world = rng.uniform(-2.0, 2.0, (num_world, 3)).astype(np.float32)
    desc = rng.normal(size=(num_world, desc_dim)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    M = _absolute_poses(gt, n)
    feats = FragmentFeatures()
    for i in range(n):
        kp = world @ M[i][:3, :3].T + M[i][:3, 3]
        feats.add(i, kp.astype(np.float32), desc,
                  rng.uniform(size=(num_world,)).astype(np.float32))
    return feats


def _scene_n_fragments(scene):
    with open(os.path.join(GT_ROOT, f"{scene}-evaluation", "gt.log")) as f:
        return int(f.readline().split()[2])


@pytest.mark.parametrize("scene", ["7-scenes-redkitchen",
                                   "sun3d-hotel_uc-scan3"])
def test_perfect_descriptors_get_full_recall_on_real_gt(scene):
    gt = load_gt_log(os.path.join(GT_ROOT, f"{scene}-evaluation"))
    n = _scene_n_fragments(scene)
    feats = _consistent_features(gt, n)
    res = register_scene(feats, gt, scene=scene, num_points=250)
    assert res.gt_pairs == len(gt)
    # GT poses are estimates from one reconstruction: globally consistent to
    # well under the 10 cm inlier threshold, so ideal descriptors must match
    # essentially every pair
    assert res.recall >= 99.0, res
    assert res.avg_inlier_ratio > 0.9, res


def test_random_descriptors_get_no_recall_on_real_gt():
    scene = "7-scenes-redkitchen"
    gt = load_gt_log(os.path.join(GT_ROOT, f"{scene}-evaluation"))
    n = _scene_n_fragments(scene)
    rng = np.random.default_rng(7)
    feats = _consistent_features(gt, n)
    for i in range(n):  # break the descriptors, keep the geometry
        d = rng.normal(size=feats.descriptors[i].shape).astype(np.float32)
        feats.descriptors[i] = d / np.linalg.norm(d, axis=1, keepdims=True)
    res = register_scene(feats, gt, scene=scene, num_points=250)
    assert res.recall <= 5.0, res


def test_evaluate_scenes_aggregates_over_real_gt_root():
    """The multi-scene driver path against the repo-default gt_root
    (reference aggregation: test.py:226-234)."""
    per_scene = {}
    for scene in SCENES_8[:2]:
        gt = load_gt_log(os.path.join(GT_ROOT, f"{scene}-evaluation"))
        per_scene[scene] = _consistent_features(gt, _scene_n_fragments(scene))
    results, summary = evaluate_scenes(per_scene, GT_ROOT, num_points=250)
    assert len(results) == 2
    assert summary["avg_recall"] >= 99.0
    assert 0.0 < summary["avg_inlier_ratio"] <= 1.0
