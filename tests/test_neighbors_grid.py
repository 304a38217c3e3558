"""Cell-grid radius search vs. the numpy reference and the brute-force op."""

import numpy as np
import jax.numpy as jnp
import pytest

from d3feat_tpu.ops.neighbors import radius_neighbors, radius_neighbors_grid
from tests.reference_ops import np_radius_neighbors


def _pad(pts, cap):
    out = np.full((cap, 3), 1.0e6, np.float32)
    out[: len(pts)] = pts
    return out


def _row_sets_equal(a, b, shadow_a, shadow_b):
    assert a.shape == b.shape
    for i in range(len(a)):
        assert (set(a[i]) - {shadow_a}) == (set(b[i]) - {shadow_b}), i


@pytest.mark.parametrize("seed", [0, 1])
def test_grid_matches_numpy(seed, rng):
    rng = np.random.default_rng(seed)
    n0, n1 = 220, 180
    pts = np.concatenate([
        rng.normal(size=(n0, 3)), rng.normal(size=(n1, 3)) + 0.3
    ]).astype(np.float32)
    lens = np.array([n0, n1], np.int32)
    cap = 512
    r, k = 0.55, 12
    got, overflow = radius_neighbors_grid(
        jnp.asarray(_pad(pts, cap)), jnp.asarray(_pad(pts, cap)),
        jnp.asarray(lens), jnp.asarray(lens), r,
        max_k=k, num_clouds=2, query_tile=128, cell_capacity=64,
    )
    assert not bool(overflow)
    got = np.asarray(got)[: len(pts)]
    ref = np_radius_neighbors(pts, pts, lens, lens, r, k)
    got = np.where(got == cap, len(pts), got)
    _row_sets_equal(got, ref, len(pts), len(pts))
    # ascending distance within rows
    for i in range(len(pts)):
        valid = got[i][got[i] < len(pts)]
        d = np.linalg.norm(pts[valid] - pts[i], axis=1)
        assert (np.diff(d) >= -1e-6).all()


def test_grid_matches_brute():
    rng = np.random.default_rng(3)
    n0, n1 = 300, 260
    pts = np.concatenate([
        rng.uniform(0, 2, size=(n0, 3)), rng.uniform(0, 2, size=(n1, 3))
    ]).astype(np.float32)
    lens = np.array([n0, n1], np.int32)
    cap = 1024
    r, k = 0.4, 16
    args = (jnp.asarray(_pad(pts, cap)), jnp.asarray(_pad(pts, cap)),
            jnp.asarray(lens), jnp.asarray(lens), r)
    brute = np.asarray(radius_neighbors(
        *args, max_k=k, num_clouds=2, query_tile=256))[: len(pts)]
    grid, ov = radius_neighbors_grid(
        *args, max_k=k, num_clouds=2, query_tile=256, cell_capacity=64)
    assert not bool(ov)
    grid = np.asarray(grid)[: len(pts)]
    _row_sets_equal(grid, brute, cap, cap)


def test_grid_overflow_flag():
    # 200 coincident points in one cell with capacity 8 -> overflow
    pts = np.zeros((200, 3), np.float32)
    lens = np.array([200, 0], np.int32)
    cap = 256
    _, ov = radius_neighbors_grid(
        jnp.asarray(_pad(pts, cap)), jnp.asarray(_pad(pts, cap)),
        jnp.asarray(lens), jnp.asarray(lens), 0.5,
        max_k=8, num_clouds=2, query_tile=64, cell_capacity=8,
    )
    assert bool(ov)


def test_grid_cross_cloud_isolation():
    rng = np.random.default_rng(4)
    cloud = rng.normal(size=(120, 3)).astype(np.float32)
    pts = np.concatenate([cloud, cloud])
    lens = np.array([120, 120], np.int32)
    cap = 512
    out, _ = radius_neighbors_grid(
        jnp.asarray(_pad(pts, cap)), jnp.asarray(_pad(pts, cap)),
        jnp.asarray(lens), jnp.asarray(lens), 0.7,
        max_k=8, num_clouds=2, query_tile=128, cell_capacity=64,
    )
    out = np.asarray(out)
    first, second = out[:120], out[120:240]
    assert ((first < 120) | (first == cap)).all()
    assert (((second >= 120) & (second < 240)) | (second == cap)).all()
    # padding queries all shadow
    assert (out[240:] == cap).all()


# ---------------------------------------------------------------------------
# banded variant
# ---------------------------------------------------------------------------

from d3feat_tpu.ops.neighbors import radius_neighbors_banded


@pytest.mark.parametrize("seed", [0, 5])
def test_banded_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    n0, n1 = 240, 190
    # anisotropic extents so the longest-axis choice matters
    pts = np.concatenate([
        rng.uniform(0, 1, size=(n0, 3)) * np.array([4.0, 1.0, 0.5]),
        rng.uniform(0, 1, size=(n1, 3)) * np.array([0.5, 3.0, 1.0]),
    ]).astype(np.float32)
    lens = np.array([n0, n1], np.int32)
    cap = 512
    r, k = 0.45, 12
    got, ov = radius_neighbors_banded(
        jnp.asarray(_pad(pts, cap)), jnp.asarray(_pad(pts, cap)),
        jnp.asarray(lens), jnp.asarray(lens), r,
        max_k=k, num_clouds=2, query_tile=64, band_cap=512,
    )
    assert not bool(ov)
    got = np.asarray(got)[: len(pts)]
    ref = np_radius_neighbors(pts, pts, lens, lens, r, k)
    got = np.where(got == cap, len(pts), got)
    _row_sets_equal(got, ref, len(pts), len(pts))
    for i in range(len(pts)):
        valid = got[i][got[i] < len(pts)]
        d = np.linalg.norm(pts[valid] - pts[i], axis=1)
        assert (np.diff(d) >= -1e-6).all()


def test_banded_overflow_flag():
    rng = np.random.default_rng(6)
    # all points in one bin along every axis -> band must cover everything
    pts = (rng.uniform(0, 1, size=(300, 3)) * 0.05).astype(np.float32)
    lens = np.array([300, 0], np.int32)
    cap = 512
    _, ov = radius_neighbors_banded(
        jnp.asarray(_pad(pts, cap)), jnp.asarray(_pad(pts, cap)),
        jnp.asarray(lens), jnp.asarray(lens), 0.1,
        max_k=8, num_clouds=2, query_tile=64, band_cap=128,
    )
    assert bool(ov)


def test_banded_matches_brute_on_fragment():
    from d3feat_tpu.data.synthetic import synthetic_fragment

    rng = np.random.default_rng(7)
    pts = synthetic_fragment(rng, 1200, extent=3.0)
    lens = np.array([1200, 0], np.int32)
    cap = 2048
    # k above the densest neighborhood so no truncation: truncated rows may
    # legitimately differ at the k-th boundary between near-tied distances
    r, k = 0.075 * 4, 96
    args = (jnp.asarray(_pad(pts, cap)), jnp.asarray(_pad(pts, cap)),
            jnp.asarray(lens), jnp.asarray(lens), r)
    brute = np.asarray(radius_neighbors(
        *args, max_k=k, num_clouds=2, query_tile=256))[:1200]
    assert (brute[:, -1] == cap).all(), "raise k: some rows truncated"
    banded, ov = radius_neighbors_banded(
        *args, max_k=k, num_clouds=2, query_tile=256, band_cap=1024)
    assert not bool(ov)
    banded = np.asarray(banded)[:1200]
    _row_sets_equal(banded, brute, cap, cap)
