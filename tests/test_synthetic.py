"""Synthetic scan-data generators: warp field, world-frame scenes, corpus split.

The domain-warp field is load-bearing for training (unwarped primitive
rooms are piecewise-perfect planes and descriptor training stalls — see
d3feat_tpu/data/synthetic.py:make_warp_field docstring), so its contract
is pinned here: deterministic per seed, a pure function of world position
(fused-view / cross-fragment consistency), smooth at surface-detail
scale, and with RMS displacement that scales with amplitude.
"""

import numpy as np
import pytest

from d3feat_tpu.data.synthetic import (
    DiskScanPairDataset,
    make_warp_field,
    scan_pair_world,
)


def test_warp_field_deterministic_and_positional():
    f1 = make_warp_field(np.random.default_rng(7), amplitude=1.5)
    f2 = make_warp_field(np.random.default_rng(7), amplitude=1.5)
    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 3.0, (512, 3)).astype(np.float32)
    np.testing.assert_array_equal(f1(x), f2(x))
    # pure function of world position: the same point warps identically
    # regardless of which array (fragment / fused view) it arrives in
    both = np.concatenate([x[:10], x])
    np.testing.assert_array_equal(f1(both)[:10], f1(x[:10]))


def test_warp_field_magnitude_and_smoothness():
    rng_pts = np.random.default_rng(1)
    x = rng_pts.uniform(0.0, 3.0, (4096, 3)).astype(np.float32)
    rms = {}
    for amp in (1.0, 2.0):
        f = make_warp_field(np.random.default_rng(3), amplitude=amp)
        d = f(x) - x
        rms[amp] = float(np.sqrt(np.mean(np.sum(d * d, axis=1))))
    # documented: RMS displacement ~2.4 cm at amplitude=1, linear in amp
    assert 0.01 < rms[1.0] < 0.05
    assert rms[2.0] == pytest.approx(2.0 * rms[1.0], rel=1e-5)
    # smooth at surface-detail scale: 1 mm steps move the warped point
    # by ~1 mm (+ O(amp * step / min_wavelength)), never a jump
    f = make_warp_field(np.random.default_rng(3), amplitude=1.5)
    step = np.array([1e-3, 0.0, 0.0], dtype=np.float32)
    jump = np.linalg.norm(f(x + step) - f(x), axis=1)
    assert float(jump.max()) < 5e-3


def test_scan_pair_world_warp_keeps_corr_contract():
    rng = np.random.default_rng(11)
    w0, w1, pairs = scan_pair_world(
        rng, resolution=(80, 60), max_corr=256, warp=1.5)
    assert w0.dtype == np.float32 and w1.dtype == np.float32
    assert len(pairs) >= 8
    # correspondences are built AFTER warping: GT pairs must still be
    # within corr_radius in (warped) world space
    d = np.linalg.norm(w0[pairs[:, 0]] - w1[pairs[:, 1]], axis=1)
    assert float(d.max()) <= 0.0375 + 1e-6


def test_disk_corpus_train_val_scene_disjoint(tmp_path):
    for i in range(8):
        np.savez(tmp_path / f"scene_{i * 25:06d}.npz",
                 w0=np.zeros((300, 3), np.float32),
                 w1=np.zeros((300, 3), np.float32),
                 pairs=np.zeros((16, 2), np.int32))
    train = DiskScanPairDataset(str(tmp_path), role="train")
    val = DiskScanPairDataset(str(tmp_path), role="val")
    train_files, val_files = set(train._files), set(val._files)
    assert not (train_files & val_files)
    assert train_files | val_files == {
        str(tmp_path / f"scene_{i * 25:06d}.npz") for i in range(8)}
    # scene number % VAL_MOD == 0 -> val (stable as the corpus grows)
    assert len(val_files) == 4  # 0, 50, 100, 150


def _oversized_scene(tmp_path):
    rng = np.random.default_rng(3)
    w0 = rng.normal(size=(3000, 3)).astype(np.float32)
    w1 = w0[:2500] + rng.normal(scale=0.005, size=(2500, 3)).astype(np.float32)
    pairs = np.stack([np.arange(400), np.arange(400)], axis=1).astype(np.int32)
    np.savez(tmp_path / "scene_000001.npz", w0=w0, w1=w1, pairs=pairs)
    return w0, w1


def _check_fit(item, cap):
    n0, n1 = int(item.lengths[0]), int(item.lengths[1])
    assert n0 + n1 <= cap
    assert int(item.corr_valid.sum()) >= 1
    k = int(item.corr_valid.sum())
    a, p = item.corr[:k, 0], item.corr[:k, 1]
    assert int(a.max()) < n0 and int(p.max()) < n1
    # anchors == positives in world space (identity pairing, no
    # rotation/translation/noise), so remapping stayed consistent
    src = item.points[:n0][a]
    tgt = item.points[n0:n0 + n1][p]
    assert float(np.linalg.norm(src - tgt, axis=1).max()) <= 0.05
    return n0, n1


def test_disk_corpus_crops_oversized_scene_to_fit(tmp_path):
    w0, _ = _oversized_scene(tmp_path)
    ds = DiskScanPairDataset(str(tmp_path), num_corr=128, seed=0,
                             noise=0.0, augment_rotation=0.0,
                             augment_translation=0.0)  # fit_mode='crop'
    item = ds.packed(0, point_capacity=2048, corr_capacity=128)
    n0, n1 = _check_fit(item, 2048)
    # crop preserves local density: kept cloud-0 points lie in one sphere
    # (bounded diameter), not thinned across the whole scene extent
    kept = item.points[:n0]
    center = kept.mean(axis=0)
    r = np.linalg.norm(kept - center, axis=1).max()
    full_r = np.linalg.norm(w0 - w0.mean(axis=0), axis=1).max()
    assert r < 0.8 * full_r


def test_disk_corpus_subsample_fit_mode_keeps_corr_density(tmp_path):
    _oversized_scene(tmp_path)
    ds = DiskScanPairDataset(str(tmp_path), num_corr=128, seed=0,
                             noise=0.0, augment_rotation=0.0,
                             augment_translation=0.0, fit_mode="subsample")
    item = ds.packed(0, point_capacity=2048, corr_capacity=128)
    _check_fit(item, 2048)
    # subsample mode always keeps the endpoints of num_corr chosen pairs
    assert bool(item.corr_valid.all())


@pytest.mark.parametrize("rotation", ["axis", "axis2", "mix", "so3"])
def test_frame_scan_pair_rotation_modes_are_rigid(rotation):
    # every frame mode must place the clouds by a RIGID motion: the GT
    # correspondences must align under one best-fit SE(3) (Kabsch) with
    # residual at the noise scale. 'axis2' additionally must produce
    # composed-axis relative rotations (the held-out eval-scene class).
    from d3feat_tpu.data.synthetic import frame_scan_pair, scan_pair_world

    rng = np.random.default_rng(17)
    w0, w1, pairs = scan_pair_world(
        rng, resolution=(80, 60), max_corr=256, warp=1.5)
    pts0, pts1, corr, dk = frame_scan_pair(
        rng, w0, w1, pairs, num_corr=128, noise=0.005, rotation=rotation)
    assert pts0.dtype == np.float32 and pts1.dtype == np.float32
    a = pts0[corr[:, 0]]
    b = pts1[corr[:, 1]]
    # Kabsch: best rigid transform b -> a
    ca, cb = a.mean(0), b.mean(0)
    h = (b - cb).T @ (a - ca)
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    resid = np.linalg.norm((b - cb) @ r.T + ca - a, axis=1)
    # corr pairs are within 0.0375 in world space + 0.005 jitter
    assert float(np.median(resid)) < 0.05
    assert d > 0  # proper rotation (no reflection)
    # dist_keypts comes from the noised source keypoints
    kp = pts0[corr[:, 0]]
    np.testing.assert_allclose(
        dk, np.linalg.norm(kp[:, None] - kp[None], axis=-1), atol=1e-5)


def test_frame_scan_pair_axis2_covers_composed_rotations():
    # with independent per-cloud axis frames the relative rotation is NOT
    # a single principal-axis rotation for most draws: check that across
    # draws, at least one relative rotation moves all three principal axes
    from d3feat_tpu.data.synthetic import frame_scan_pair, scan_pair_world

    rng = np.random.default_rng(23)
    w0, w1, pairs = scan_pair_world(
        rng, resolution=(80, 60), max_corr=256, warp=1.5)
    composed = 0
    for _ in range(8):
        pts0, pts1, corr, _ = frame_scan_pair(
            rng, w0, w1, pairs, num_corr=128, noise=0.0, rotation="axis2")
        a, b = pts0[corr[:, 0]], pts1[corr[:, 1]]
        ca, cb = a.mean(0), b.mean(0)
        h = (b - cb).T @ (a - ca)
        u, _, vt = np.linalg.svd(h)
        d = np.sign(np.linalg.det(vt.T @ u.T))
        r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
        # a single-principal-axis rotation keeps one diagonal entry == 1
        if np.all(np.abs(np.diag(r) - 1.0) > 0.05):
            composed += 1
    assert composed >= 1
