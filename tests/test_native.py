"""Native C++ geometry ops: build + parity vs numpy reference and XLA ops."""

import numpy as np
import pytest

from d3feat_tpu import native
from tests.reference_ops import np_batch_voxel_subsample, np_radius_neighbors

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _stacked_pair(rng, n0=300, n1=250):
    pts0 = rng.normal(size=(n0, 3)).astype(np.float32)
    pts1 = (rng.normal(size=(n1, 3)) + 0.5).astype(np.float32)
    return np.concatenate([pts0, pts1]), np.array([n0, n1], np.int32)


def test_grid_subsample_matches_numpy():
    rng = np.random.default_rng(0)
    pts, lens = _stacked_pair(rng)
    got_pts, got_lens, overflow = native.grid_subsample_batch(pts, lens, 0.35)
    ref_pts, ref_lens = np_batch_voxel_subsample(pts.astype(np.float64), lens, 0.35)
    assert not overflow
    np.testing.assert_array_equal(got_lens, ref_lens)
    # order-invariant comparison per cloud (sets of barycenters)
    i = 0
    for n_ref in ref_lens:
        a = np.asarray(sorted(map(tuple, np.round(got_pts[i : i + n_ref], 5))))
        b = np.asarray(sorted(map(tuple, np.round(ref_pts[i : i + n_ref], 5))))
        np.testing.assert_allclose(a, b, atol=1e-4)
        i += n_ref


def test_grid_subsample_overflow_flag():
    rng = np.random.default_rng(1)
    pts, lens = _stacked_pair(rng)
    _, _, overflow = native.grid_subsample_batch(pts, lens, 0.05, capacity=10)
    assert overflow


def test_radius_neighbors_matches_numpy():
    rng = np.random.default_rng(2)
    pts, lens = _stacked_pair(rng, 200, 180)
    r, k = 0.6, 12
    got = native.radius_neighbors_batch(pts, pts, lens, lens, r, k)
    ref = np_radius_neighbors(pts, pts, lens, lens, r, k)
    # identical index sets per row; order can differ only between ties
    assert got.shape == ref.shape
    d = lambda i, j: (
        np.linalg.norm(pts[i] - pts[j]) if j < len(pts) else np.inf
    )
    for i in range(len(pts)):
        assert set(got[i]) - {len(pts)} == set(ref[i]) - {len(pts)}
        dists = [d(i, j) for j in got[i]]
        assert all(dists[a] <= dists[a + 1] + 1e-6 for a in range(k - 1))


def test_radius_neighbors_cross_cloud_isolation():
    rng = np.random.default_rng(3)
    # two identical clouds stacked: neighbors must stay within each cloud
    cloud = rng.normal(size=(100, 3)).astype(np.float32)
    pts = np.concatenate([cloud, cloud])
    lens = np.array([100, 100], np.int32)
    out = native.radius_neighbors_batch(pts, pts, lens, lens, 0.8, 8)
    shadow = 200
    first = out[:100]
    second = out[100:]
    assert ((first < 100) | (first == shadow)).all()
    assert (((second >= 100) & (second < 200)) | (second == shadow)).all()
    # symmetric structure: cloud 1 rows = cloud 0 rows + 100
    np.testing.assert_array_equal(
        np.where(first == shadow, shadow, first + 100), second
    )


def test_native_matches_xla_ops():
    """Host C++ and on-device XLA radius search agree row-for-row."""
    import jax.numpy as jnp

    from d3feat_tpu.ops.neighbors import radius_neighbors

    rng = np.random.default_rng(4)
    pts, lens = _stacked_pair(rng, 150, 120)
    cap = 512
    padded = np.full((cap, 3), 1.0e6, np.float32)
    padded[: len(pts)] = pts
    r, k = 0.5, 10
    dev = np.asarray(
        radius_neighbors(
            jnp.asarray(padded), jnp.asarray(padded), jnp.asarray(lens),
            jnp.asarray(lens), r, max_k=k, num_clouds=2, query_tile=128,
        )
    )[: len(pts)]
    host = native.radius_neighbors_batch(pts, pts, lens, lens, r, k)
    # map device shadow (cap) to host shadow (len(pts))
    dev = np.where(dev == cap, len(pts), dev)
    np.testing.assert_array_equal(np.sort(dev, 1), np.sort(host, 1))
