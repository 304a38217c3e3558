"""Fused band-conv kernel vs the XLA KPConv (interpret mode, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from d3feat_tpu.models.kernel_points import load_kernels
from d3feat_tpu.models.kpconv import init_kpconv, kpconv
from d3feat_tpu.ops.neighbors import (
    SortedLevel,
    make_level_frame,
    radius_neighbors_sorted,
)
from d3feat_tpu.ops.pallas.band_conv import band_conv


def test_band_conv_matches_kpconv():
    rng = np.random.default_rng(0)
    n0, n1 = 250, 200
    pts = np.concatenate([
        rng.uniform(0, 1, size=(n0, 3)) * np.array([3.0, 1.0, 0.5]),
        rng.uniform(0, 1, size=(n1, 3)) * np.array([0.7, 2.4, 0.8]),
    ]).astype(np.float32)
    cap = 512
    padded = np.full((cap, 3), 1.0e6, np.float32)
    padded[: len(pts)] = pts
    lens = np.array([n0, n1], np.int32)
    r, k, cin, cout, kpn = 0.4, 12, 8, 16, 15

    pts_j = jnp.asarray(padded)
    lens_j = jnp.asarray(lens)
    axis, origin = make_level_frame(pts_j, lens_j, 2)
    lvl = SortedLevel(pts_j, lens_j, 2, axis, origin, band_pad=512)

    T, BAND = 64, 512
    # sorted-space contract: rows in sorted-query order, values = positions
    neighb, ov = radius_neighbors_sorted(
        lvl, lvl, r, max_k=k, query_tile=T, band_cap=BAND, interpret=True,
        raw_positions=True)
    assert not bool(ov)

    kp = load_kernels(r, kpn, deterministic=True).astype(np.float32)
    params = init_kpconv(jax.random.key(0), kpn, cin, cout, kp)
    x = rng.normal(size=(cap, cin)).astype(np.float32)
    x[len(pts):] = 0.0
    x_sorted_n = jnp.asarray(x)[lvl.order]
    extent = r * 2.0 / 2.5

    # the XLA KPConv is index-space agnostic: run it directly in sorted
    # space on the same positions lists
    ref, _ = kpconv(lvl.pts_sorted, lvl.pts_sorted, jnp.asarray(neighb),
                    x_sorted_n, params,
                    KP_extent=extent, KP_influence="linear",
                    aggregation_mode="sum")

    x_sorted = jnp.concatenate([
        x_sorted_n, jnp.zeros((lvl.band_pad, cin), jnp.float32)])
    neighb_sorted = jnp.asarray(neighb).T  # [K, Nq]

    # per-tile starts: same computation the sorted search uses
    qk = lvl.key_sorted.reshape(-1, T)
    valid = qk < 2 * SortedLevel.KOFF
    kmin = jnp.min(jnp.where(valid, qk, jnp.float32(3e37)), axis=1)
    starts = jnp.searchsorted(
        lvl.key_sorted, kmin - (r + SortedLevel.EPS)).astype(jnp.int32)
    starts = jnp.minimum(starts, cap)

    out_sorted, _ = band_conv(
        lvl.q_packed, neighb_sorted, lvl.s_packed, x_sorted,
        params.weights, params.kernel_points, starts, jnp.float32(extent),
        band_cap=BAND, query_tile=T, interpret=True,
    )
    out = out_sorted[lvl.inv]
    ref = jnp.asarray(ref)[lvl.inv]

    np.testing.assert_allclose(
        np.asarray(out)[: len(pts) + 0], np.asarray(ref)[: len(pts) + 0],
        atol=3e-5, rtol=1e-4,
    )


def test_kpfcnn_forward_with_band_conv_matches_xla():
    """Full KPFCNN forward: fused band-conv path == XLA gather path."""
    import dataclasses

    from d3feat_tpu.config import D3FeatConfig, PyramidCaps
    from d3feat_tpu.data.pack import pack_pair
    from d3feat_tpu.data.synthetic import synthetic_pair
    from d3feat_tpu.models import apply_kpfcnn, init_kpfcnn
    from d3feat_tpu.ops import build_pyramid, make_pyramid_spec

    cfg = D3FeatConfig()
    cfg.num_layers = 2
    cfg.first_features_dim = 16
    cfg.first_subsampling_dl = 0.1
    cfg.caps = PyramidCaps(points=(512, 256), neighbors=(12, 12), corr=8)
    cfg.query_tile = 128

    rng = np.random.default_rng(3)
    n = 200
    pts0, pts1, corr, dk = synthetic_pair(rng, n_points=n, num_corr=8,
                                          extent=2.0)
    packed = pack_pair(
        pts0, pts1, np.ones((n, 1), np.float32), np.ones((n, 1), np.float32),
        corr, dk, point_capacity=512, corr_capacity=8,
    )
    spec = make_pyramid_spec(cfg, num_clouds=2)
    spec_band = dataclasses.replace(spec, force_band_export=True)
    pyr = dict(build_pyramid(jnp.asarray(packed.points),
                             jnp.asarray(packed.lengths), spec=spec_band))
    assert pyr["band"], "band state missing"
    # band export => sorted-space pyramid: inputs remap through order0
    pyr["features"] = jnp.asarray(packed.features)[pyr["band"][0]["order"]]

    params, state, specs = init_kpfcnn(jax.random.key(0), cfg)
    out_band, _, _ = apply_kpfcnn(params, state, pyr, cfg, specs, train=False)

    # the XLA gather path consumes the SAME sorted-space structure (it is
    # index-space agnostic), so outputs compare row-for-row
    pyr_plain = dict(pyr)
    pyr_plain["band"] = {}
    out_xla, _, _ = apply_kpfcnn(params, state, pyr_plain, cfg, specs,
                                 train=False)
    total = int(np.sum(np.asarray(packed.lengths)))
    # the dense-band formulation sums in a different order than the gather
    # path (and influence weights come from exact vs expansion distances):
    # agreement is to fp-accumulation level across the composed network
    np.testing.assert_allclose(
        np.asarray(out_band.features)[:total],
        np.asarray(out_xla.features)[:total], atol=3e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_band.scores)[:total],
        np.asarray(out_xla.scores)[:total], atol=3e-3,
    )


def test_band_conv_bf16_panels_close_to_f32():
    """bfloat16 panel mode: MXU operands in bf16, f32 accumulation.

    Geometry/selection/density stay f32, so the neighbor set is identical;
    only the feature contractions round. Descriptor-level error stays well
    under 1% relative.
    """
    import dataclasses  # noqa: F401

    rng = np.random.default_rng(5)
    n = 900
    pts = (rng.uniform(0, 1, size=(n, 3))
           * np.array([2.0, 1.5, 0.8])).astype(np.float32)
    cap = 1024
    padded = np.full((cap, 3), 1.0e6, np.float32)
    padded[:n] = pts
    lens = np.array([n, 0], np.int32)
    r, k, cin, cout, kpn = 0.25, 24, 32, 32, 15

    pts_j = jnp.asarray(padded)
    lens_j = jnp.asarray(lens)
    axis, origin = make_level_frame(pts_j, lens_j, 2)
    lvl = SortedLevel(pts_j, lens_j, 2, axis, origin, band_pad=512)

    T, BAND = 64, 512
    neighb, ov = radius_neighbors_sorted(
        lvl, lvl, r, max_k=k, query_tile=T, band_cap=BAND, interpret=True,
        raw_positions=True)
    assert not bool(ov)

    kp = load_kernels(r, kpn, deterministic=True).astype(np.float32)
    params = init_kpconv(jax.random.key(0), kpn, cin, cout, kp)
    x = rng.normal(size=(cap, cin)).astype(np.float32)
    x[len(pts):] = 0.0
    x_sorted = jnp.concatenate([
        jnp.asarray(x)[lvl.order], jnp.zeros((lvl.band_pad, cin),
                                             jnp.float32)])
    neighb_sorted = jnp.asarray(neighb).T
    extent = r * 2.0 / 2.5

    qk = lvl.key_sorted.reshape(-1, T)
    valid = qk < 2 * SortedLevel.KOFF
    kmin = jnp.min(jnp.where(valid, qk, jnp.float32(3e37)), axis=1)
    starts = jnp.minimum(jnp.searchsorted(
        lvl.key_sorted, kmin - (r + SortedLevel.EPS)).astype(jnp.int32), cap)

    outs = {}
    for pd in ("float32", "bfloat16"):
        outs[pd] = np.asarray(band_conv(
            lvl.q_packed, neighb_sorted, lvl.s_packed, x_sorted,
            params.weights, params.kernel_points, starts,
            jnp.float32(extent),
            band_cap=BAND, query_tile=T, interpret=True, panel_dtype=pd,
        )[0])[:n]
    ref, got = outs["float32"], outs["bfloat16"]
    rel = (np.linalg.norm(got - ref) / np.linalg.norm(ref))
    assert rel < 0.01, f"bf16 panel relative error {rel}"


def _thr_setup(pts, lens, r, k, cin, cout, kpn, cap, band_pad=512,
               grid_pts=False):
    pts_j = jnp.asarray(pts)
    lens_j = jnp.asarray(lens)
    axis, origin = make_level_frame(pts_j, lens_j, 2)
    lvl = SortedLevel(pts_j, lens_j, 2, axis, origin, band_pad=band_pad)
    T, BAND = 64, band_pad
    neighb, ov, thr, ptie = radius_neighbors_sorted(
        lvl, lvl, r, max_k=k, query_tile=T, band_cap=BAND, interpret=True,
        raw_positions=True, with_threshold=True)
    assert not bool(ov)
    kp = load_kernels(r, kpn, deterministic=True).astype(np.float32)
    params = init_kpconv(jax.random.key(0), kpn, cin, cout, kp)
    rng = np.random.default_rng(7)
    x = rng.normal(size=(cap, cin)).astype(np.float32)
    x[int(np.sum(lens)):] = 0.0
    x_sorted_n = jnp.asarray(x)[lvl.order]
    extent = r * 2.0 / 2.5
    x_sorted = jnp.concatenate([
        x_sorted_n, jnp.zeros((lvl.band_pad, cin), jnp.float32)])
    neighb_sorted = jnp.asarray(neighb).T
    qk = lvl.key_sorted.reshape(-1, T)
    valid = qk < 2 * SortedLevel.KOFF
    kmin = jnp.min(jnp.where(valid, qk, jnp.float32(3e37)), axis=1)
    starts = jnp.searchsorted(
        lvl.key_sorted, kmin - (r + SortedLevel.EPS)).astype(jnp.int32)
    starts = jnp.minimum(starts, cap)
    common = dict(band_cap=BAND, query_tile=T, interpret=True)
    out_list, den_list = band_conv(
        lvl.q_packed, neighb_sorted, lvl.s_packed, x_sorted,
        params.weights, params.kernel_points, starts, jnp.float32(extent),
        **common)
    out_thr, den_thr = band_conv(
        lvl.q_packed, neighb_sorted, lvl.s_packed, x_sorted,
        params.weights, params.kernel_points, starts, jnp.float32(extent),
        None, thr, ptie, **common)
    return out_list, den_list, out_thr, den_thr


def test_band_conv_threshold_matches_list_mode():
    """Threshold selection must reproduce list membership exactly: the
    density denominators (pure counts of selected active rows) must be
    IDENTICAL, and outputs equal up to the d2-expansion rounding."""
    rng = np.random.default_rng(3)
    n0, n1 = 230, 210
    pts = np.concatenate([
        rng.uniform(0, 1, size=(n0, 3)) * np.array([3.0, 1.0, 0.5]),
        rng.uniform(0, 1, size=(n1, 3)) * np.array([0.7, 2.4, 0.8]),
    ]).astype(np.float32)
    cap = 512
    padded = np.full((cap, 3), 1.0e6, np.float32)
    padded[: len(pts)] = pts
    lens = np.array([n0, n1], np.int32)
    out_l, den_l, out_t, den_t = _thr_setup(
        padded, lens, 0.4, 12, 8, 16, 15, cap)
    # selection is a count: must match exactly
    np.testing.assert_array_equal(np.asarray(den_l)[0], np.asarray(den_t)[0])
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_l),
                               atol=5e-5, rtol=1e-4)


def test_band_conv_threshold_exact_ties():
    """Grid-structured points produce exact f32 distance ties at the K
    boundary; the (thr, ptie) tie-break must keep membership identical."""
    # a 7x7x7 integer grid scaled: many exactly-equal neighbor distances
    g = np.stack(np.meshgrid(*([np.arange(7.0)] * 3), indexing="ij"),
                 axis=-1).reshape(-1, 3).astype(np.float32) * 0.1
    n0 = len(g)  # 343
    cap = 512
    padded = np.full((cap, 3), 1.0e6, np.float32)
    padded[:n0] = g
    # tiny second cloud far away
    padded[n0:n0 + 8] = np.arange(24, dtype=np.float32).reshape(8, 3) * 0.05
    lens = np.array([n0, 8], np.int32)
    # k=6 < 18-neighbor shells: the K-th slot lands mid-tie constantly
    out_l, den_l, out_t, den_t = _thr_setup(
        padded, lens, 0.21, 6, 4, 8, 15, cap)
    np.testing.assert_array_equal(np.asarray(den_l)[0], np.asarray(den_t)[0])
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_l),
                               atol=5e-5, rtol=1e-4)
