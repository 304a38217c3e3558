import numpy as np

from d3feat_tpu.ops import radius_neighbors, count_in_radius, SHADOW_COORD
from tests.reference_ops import np_radius_neighbors


def _pad(pts, capacity):
    out = np.full((capacity, 3), SHADOW_COORD, np.float32)
    out[: len(pts)] = pts
    return out


def test_matches_reference_single_cloud(rng):
    q = rng.uniform(0, 1, size=(50, 3)).astype(np.float32)
    s = rng.uniform(0, 1, size=(80, 3)).astype(np.float32)
    ref = np_radius_neighbors(q, s, [50], [80], 0.3, 10)
    got = np.asarray(
        radius_neighbors(
            _pad(q, 64), _pad(s, 96),
            np.array([50], np.int32), np.array([80], np.int32),
            0.3, max_k=10, num_clouds=1, query_tile=32,
        )
    )[:50]
    # shadow indices differ (96 vs 80): normalize both to -1
    ref_n = np.where(ref == 80, -1, ref)
    got_n = np.where(got == 96, -1, got)
    np.testing.assert_array_equal(got_n, ref_n)


def test_two_clouds_no_cross_matching(rng):
    c0 = rng.uniform(0, 1, size=(40, 3)).astype(np.float32)
    c1 = c0 + 0.001  # nearly identical clouds — must not cross-match
    stacked = np.concatenate([c0, c1])
    lengths = np.array([40, 40], np.int32)
    got = np.asarray(
        radius_neighbors(
            _pad(stacked, 96), _pad(stacked, 96), lengths, lengths,
            0.5, max_k=8, num_clouds=2, query_tile=32,
        )
    )
    valid = got[:40][got[:40] != 96]
    assert valid.max() < 40  # cloud-0 queries only hit cloud-0 supports
    valid1 = got[40:80][got[40:80] != 96]
    assert valid1.min() >= 40 and valid1.max() < 80


def test_rows_sorted_by_distance(rng):
    q = rng.uniform(0, 1, size=(30, 3)).astype(np.float32)
    s = rng.uniform(0, 1, size=(200, 3)).astype(np.float32)
    got = np.asarray(
        radius_neighbors(
            _pad(q, 32), _pad(s, 256),
            np.array([30], np.int32), np.array([200], np.int32),
            0.4, max_k=16, num_clouds=1, query_tile=16,
        )
    )[:30]
    for i in range(30):
        idx = got[i][got[i] != 256]
        d = np.linalg.norm(s[idx] - q[i], axis=1)
        assert np.all(np.diff(d) >= -1e-6), d


def test_self_query_first_column_is_self(rng):
    pts = rng.uniform(0, 1, size=(60, 3)).astype(np.float32)
    lengths = np.array([60], np.int32)
    got = np.asarray(
        radius_neighbors(
            _pad(pts, 64), _pad(pts, 64), lengths, lengths,
            0.2, max_k=8, num_clouds=1, query_tile=16,
        )
    )[:60]
    np.testing.assert_array_equal(got[:, 0], np.arange(60))


def test_invalid_queries_all_shadow(rng):
    pts = rng.uniform(0, 1, size=(10, 3)).astype(np.float32)
    got = np.asarray(
        radius_neighbors(
            _pad(pts, 32), _pad(pts, 32),
            np.array([10], np.int32), np.array([10], np.int32),
            0.5, max_k=4, num_clouds=1, query_tile=8,
        )
    )
    assert np.all(got[10:] == 32)


def test_count_in_radius_matches(rng):
    q = rng.uniform(0, 1, size=(25, 3)).astype(np.float32)
    s = rng.uniform(0, 1, size=(70, 3)).astype(np.float32)
    ref = np_radius_neighbors(q, s, [25], [70], 0.35, 70)
    ref_counts = np.sum(ref != 70, axis=1)
    got = np.asarray(
        count_in_radius(
            _pad(q, 32), _pad(s, 96),
            np.array([25], np.int32), np.array([70], np.int32),
            0.35, num_clouds=1, query_tile=8,
        )
    )[:25]
    np.testing.assert_array_equal(got, ref_counts)
