"""Pallas fused band-select kernel vs numpy reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from d3feat_tpu.ops.neighbors import radius_neighbors_pallas
from tests.reference_ops import np_radius_neighbors


def _pad(pts, cap):
    out = np.full((cap, 3), 1.0e6, np.float32)
    out[: len(pts)] = pts
    return out


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    n0, n1 = 200, 170
    pts = np.concatenate([
        rng.uniform(0, 1, size=(n0, 3)) * np.array([3.0, 1.0, 0.6]),
        rng.uniform(0, 1, size=(n1, 3)) * np.array([0.8, 2.5, 1.0]),
    ]).astype(np.float32)
    lens = np.array([n0, n1], np.int32)
    cap = 512
    r, k = 0.5, 10
    got, ov = radius_neighbors_pallas(
        jnp.asarray(_pad(pts, cap)), jnp.asarray(_pad(pts, cap)),
        jnp.asarray(lens), jnp.asarray(lens), r,
        max_k=k, num_clouds=2, query_tile=64, band_cap=512, interpret=True,
    )
    assert not bool(ov)
    got = np.asarray(got)[: len(pts)]
    ref = np_radius_neighbors(pts, pts, lens, lens, r, k)
    got = np.where(got == cap, len(pts), got)
    for i in range(len(pts)):
        assert set(got[i]) - {len(pts)} == set(ref[i]) - {len(pts)}, i
        valid = got[i][got[i] < len(pts)]
        d = np.linalg.norm(pts[valid] - pts[i], axis=1)
        assert (np.diff(d) >= -1e-6).all()


def test_pallas_overflow_and_padding_rows():
    rng = np.random.default_rng(5)
    pts = (rng.uniform(0, 1, size=(300, 3)) * 0.05).astype(np.float32)
    lens = np.array([300, 0], np.int32)
    cap = 512
    got, ov = radius_neighbors_pallas(
        jnp.asarray(_pad(pts, cap)), jnp.asarray(_pad(pts, cap)),
        jnp.asarray(lens), jnp.asarray(lens), 0.1,
        max_k=8, num_clouds=2, query_tile=64, band_cap=128, interpret=True,
    )
    assert bool(ov)
    # padding query rows are all shadow
    assert (np.asarray(got)[300:] == cap).all()


def test_sorted_levels_match_numpy():
    """The shared-sorted-level path (used by the TPU pyramid) vs numpy."""
    from d3feat_tpu.ops.neighbors import (
        SortedLevel,
        make_level_frame,
        radius_neighbors_sorted,
    )

    rng = np.random.default_rng(9)
    n0, n1 = 260, 210
    pts = np.concatenate([
        rng.uniform(0, 1, size=(n0, 3)) * np.array([3.0, 1.0, 0.5]),
        rng.uniform(0, 1, size=(n1, 3)) * np.array([0.7, 2.2, 0.9]),
    ]).astype(np.float32)
    lens = np.array([n0, n1], np.int32)
    cap = 512
    r, k = 0.5, 12
    padded = jnp.asarray(_pad(pts, cap))
    lens_j = jnp.asarray(lens)
    axis, origin = make_level_frame(padded, lens_j, 2)
    lvl = SortedLevel(padded, lens_j, 2, axis, origin, band_pad=512)
    got, ov = radius_neighbors_sorted(
        lvl, lvl, r, max_k=k, query_tile=64, band_cap=512, interpret=True,
    )
    assert not bool(ov)
    got = np.asarray(got)[: len(pts)]
    got = np.where(got == cap, len(pts), got)
    ref = np_radius_neighbors(pts, pts, lens, lens, r, k)
    for i in range(len(pts)):
        assert set(got[i]) - {len(pts)} == set(ref[i]) - {len(pts)}, i
