import numpy as np

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.ops import build_pyramid, make_pyramid_spec, SHADOW_COORD
from tests.reference_ops import np_batch_voxel_subsample, np_radius_neighbors


def small_config():
    cfg = D3FeatConfig()
    cfg.num_layers = 3
    cfg.first_subsampling_dl = 0.05
    cfg.caps = PyramidCaps(points=(512, 384, 256), neighbors=(16, 16, 16), corr=32)
    return cfg


def _pack(clouds, capacity):
    pts = np.concatenate(clouds).astype(np.float32)
    out = np.full((capacity, 3), SHADOW_COORD, np.float32)
    out[: len(pts)] = pts
    return out, np.array([len(c) for c in clouds], np.int32)


def test_structure_and_shapes(rng):
    cfg = small_config()
    spec = make_pyramid_spec(cfg, num_clouds=2)
    c0 = rng.uniform(0, 1, size=(200, 3))
    c1 = rng.uniform(0, 1, size=(150, 3))
    pts, lens = _pack([c0, c1], 512)
    pyr = build_pyramid(pts, lens, spec=spec)

    assert len(pyr["points"]) == 3
    assert len(pyr["pools"]) == 2 and len(pyr["upsamples"]) == 2
    for l in range(3):
        assert pyr["points"][l].shape == (cfg.caps.points[l], 3)
        assert pyr["neighbors"][l].shape == (cfg.caps.points[l], 16)
    assert pyr["pools"][0].shape == (cfg.caps.points[1], 16)
    assert pyr["upsamples"][0].shape == (cfg.caps.points[0], 1)
    assert not bool(pyr["overflow"])


def test_levels_match_reference_pipeline(rng):
    cfg = small_config()
    spec = make_pyramid_spec(cfg, num_clouds=2)
    c0 = rng.uniform(0, 1, size=(200, 3))
    c1 = rng.uniform(0, 1, size=(150, 3))
    pts, lens = _pack([c0, c1], 512)
    pyr = build_pyramid(pts, lens, spec=spec)

    # replicate the reference collate loop on host
    r = cfg.first_subsampling_dl * cfg.conv_radius
    host_pts = np.concatenate([c0, c1])
    host_lens = [200, 150]
    for l in range(3):
        dev_lens = np.asarray(pyr["lengths"][l])
        assert list(dev_lens) == list(host_lens), f"level {l}"
        n = sum(host_lens)
        dev_pts = np.asarray(pyr["points"][l][:n])
        # order-invariant set match per cloud
        i0 = 0
        for b, ln in enumerate(host_lens):
            d = np.linalg.norm(
                dev_pts[i0 : i0 + ln, None, :] - host_pts[None, i0 : i0 + ln, :],
                axis=-1,
            )
            assert d.min(axis=1).max() < 1e-5, f"level {l} cloud {b}"
            i0 += ln

        # neighbor counts per row must match the reference search on the
        # device's own point ordering
        ref_nb = np_radius_neighbors(dev_pts, dev_pts, host_lens, host_lens, r, 16)
        got_nb = np.asarray(pyr["neighbors"][l][:n])
        cap = pyr["points"][l].shape[0]
        np.testing.assert_array_equal(got_nb == cap, ref_nb == n)

        if l < 2:
            dl = 2 * r / cfg.conv_radius
            host_pts, host_lens_arr = np_batch_voxel_subsample(dev_pts, host_lens, dl)
            host_lens = list(host_lens_arr)
        r *= 2


def test_upsample_is_nearest_cell(rng):
    cfg = small_config()
    spec = make_pyramid_spec(cfg, num_clouds=2)
    c0 = rng.uniform(0, 1, size=(100, 3))
    c1 = rng.uniform(0, 1, size=(100, 3))
    pts, lens = _pack([c0, c1], 512)
    pyr = build_pyramid(pts, lens, spec=spec)

    lv0 = np.asarray(pyr["points"][0][:200])
    n1 = int(np.asarray(pyr["lengths"][1]).sum())
    lv1 = np.asarray(pyr["points"][1][:n1])
    up = np.asarray(pyr["upsamples"][0][:200, 0])
    lens1 = np.asarray(pyr["lengths"][1])
    for i in range(200):
        cloud = 0 if i < 100 else 1
        lo, hi = (0, lens1[0]) if cloud == 0 else (lens1[0], lens1[0] + lens1[1])
        d = np.linalg.norm(lv1[lo:hi] - lv0[i], axis=1)
        j = up[i]
        if j == pyr["points"][1].shape[0]:  # shadow: nothing within 2r
            assert d.min() > 2 * 0.05 * 2.5 - 1e-5
        else:
            assert lo <= j < hi
            assert abs(d.min() - np.linalg.norm(lv1[j] - lv0[i])) < 1e-5
