import numpy as np
import jax.numpy as jnp

from d3feat_tpu.ops import voxel_subsample, SHADOW_COORD
from tests.reference_ops import np_batch_voxel_subsample


def _stack_pad(clouds, capacity):
    pts = np.concatenate(clouds, axis=0).astype(np.float32)
    n = len(pts)
    out = np.full((capacity, 3), SHADOW_COORD, np.float32)
    out[:n] = pts
    lengths = np.array([len(c) for c in clouds], np.int32)
    return out, lengths


def _match_sets(a, b, tol=1e-5):
    """Order-invariant point-set equality via nearest-neighbor assignment."""
    assert a.shape == b.shape, (a.shape, b.shape)
    d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    assert d.min(axis=1).max() < tol
    assert d.min(axis=0).max() < tol


def test_single_cloud_barycenters(rng):
    pts = rng.uniform(0, 1, size=(500, 3))
    ref, ref_lens = np_batch_voxel_subsample(pts, [500], 0.1)
    out = voxel_subsample(
        *_stack_pad([pts], 640), 0.1, out_capacity=512, num_clouds=1
    )
    n = int(out.lengths[0])
    assert n == ref_lens[0]
    assert not bool(out.overflow)
    _match_sets(np.asarray(out.points[:n]), ref)
    assert np.all(np.asarray(out.points[n:]) == SHADOW_COORD)


def test_two_clouds_independent_grids(rng):
    c0 = rng.uniform(0, 1, size=(400, 3)) + np.array([0.013, -0.41, 0.7])
    c1 = rng.uniform(0, 1, size=(300, 3)) * 1.7
    ref, ref_lens = np_batch_voxel_subsample(
        np.concatenate([c0, c1]), [400, 300], 0.15
    )
    stacked, lengths = _stack_pad([c0, c1], 1024)
    out = voxel_subsample(stacked, lengths, 0.15, out_capacity=512, num_clouds=2)
    lens = np.asarray(out.lengths)
    assert list(lens) == list(ref_lens)
    n0, n1 = lens
    # contiguous layout: cloud0 rows then cloud1 rows
    _match_sets(np.asarray(out.points[:n0]), ref[: ref_lens[0]])
    _match_sets(np.asarray(out.points[n0 : n0 + n1]), ref[ref_lens[0] :])


def test_barycenter_values_exact():
    # 2 voxels with known contents
    pts = np.array(
        [[0.01, 0.01, 0.01], [0.03, 0.01, 0.01], [0.11, 0.01, 0.01]], np.float32
    )
    stacked, lengths = _stack_pad([pts], 8)
    out = voxel_subsample(stacked, lengths, 0.1, out_capacity=4, num_clouds=1)
    got = np.asarray(out.points[: int(out.lengths[0])])
    want = np.array([[0.02, 0.01, 0.01], [0.11, 0.01, 0.01]])
    _match_sets(got, want, tol=1e-6)


def test_capacity_overflow_truncates(rng):
    pts = rng.uniform(0, 10, size=(200, 3))  # tiny voxels -> one point per cell
    stacked, lengths = _stack_pad([pts], 256)
    out = voxel_subsample(stacked, lengths, 1e-3, out_capacity=64, num_clouds=1)
    assert bool(out.overflow)
    assert int(out.lengths[0]) == 64
    assert bool(jnp.all(out.valid))


def test_jit_cache_stability(rng):
    pts = rng.uniform(0, 1, size=(100, 3))
    stacked, lengths = _stack_pad([pts], 128)
    a = voxel_subsample(stacked, lengths, 0.2, out_capacity=64, num_clouds=1)
    b = voxel_subsample(stacked, lengths, 0.2, out_capacity=64, num_clouds=1)
    np.testing.assert_array_equal(np.asarray(a.points), np.asarray(b.points))
