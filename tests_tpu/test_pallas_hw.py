"""Pallas kernels vs oracles on REAL TPU hardware (compiled Mosaic).

Mirrors the interpret-mode checks in tests/test_pallas_select.py and
tests/test_band_conv{,_grad}.py, but against the real compiler — the two
have disagreed before (dynamic-lane stores, narrow-row DMA; ROUND1_NOTES
§3), so row-exactness on hardware is asserted here, not assumed.
"""

import numpy as np
import jax
import jax.numpy as jnp

from d3feat_tpu.models.kernel_points import load_kernels
from d3feat_tpu.models.kpconv import init_kpconv, kpconv
from d3feat_tpu.ops.neighbors import (
    SortedLevel,
    make_level_frame,
    radius_neighbors_pallas,
    radius_neighbors_sorted,
)
from d3feat_tpu.ops.pallas.band_conv import band_conv_ad


def test_select_rows_exact_on_hw():
    from tests.reference_ops import np_radius_neighbors

    rng = np.random.default_rng(0)
    n = 1500
    pts = (rng.uniform(0, 1, size=(n, 3))
           * np.array([3.0, 1.2, 0.7])).astype(np.float32)
    cap = 2048
    padded = np.full((cap, 3), 1.0e6, np.float32)
    padded[:n] = pts
    lens = np.array([n, 0], np.int32)
    r, k = 0.25, 48
    got, ov = radius_neighbors_pallas(
        jnp.asarray(padded), jnp.asarray(padded),
        jnp.asarray(lens), jnp.asarray(lens),
        r, max_k=k, num_clouds=2, query_tile=256, band_cap=1024)
    assert not bool(ov)
    got = np.asarray(got)[:n]
    got = np.where(got == cap, n, got)
    ref = np_radius_neighbors(pts, pts, lens, lens, r, k)
    for i in range(n):
        assert set(got[i]) - {n} == set(ref[i]) - {n}, f"row {i} differs"
        v = got[i][got[i] < n]
        d = np.linalg.norm(pts[v] - pts[i], axis=1)
        assert (np.diff(d) >= -1e-6).all(), f"row {i} misordered"


def test_band_conv_fwd_bwd_vs_xla_on_hw():
    rng = np.random.default_rng(1)
    n0, n1 = 700, 500
    pts = np.concatenate([
        rng.uniform(0, 1, size=(n0, 3)) * np.array([3.0, 1.0, 0.5]),
        rng.uniform(0, 1, size=(n1, 3)) * np.array([0.7, 2.4, 0.8]),
    ]).astype(np.float32)
    cap = 2048
    padded = np.full((cap, 3), 1.0e6, np.float32)
    padded[: len(pts)] = pts
    lens = np.array([n0, n1], np.int32)
    r, k, cin, cout, kpn = 0.3, 16, 16, 32, 15

    pts_j = jnp.asarray(padded)
    lens_j = jnp.asarray(lens)
    axis, origin = make_level_frame(pts_j, lens_j, 2)
    lvl = SortedLevel(pts_j, lens_j, 2, axis, origin, band_pad=1024)

    T, BAND = 256, 1024
    # sorted-space contract: rows in sorted-query order, values = positions
    neighb, ov = radius_neighbors_sorted(
        lvl, lvl, r, max_k=k, query_tile=T, band_cap=BAND,
        raw_positions=True)
    assert not bool(ov)

    kp = load_kernels(r, kpn, deterministic=True).astype(np.float32)
    params = init_kpconv(jax.random.key(0), kpn, cin, cout, kp)
    x = rng.normal(size=(cap, cin)).astype(np.float32)
    x[len(pts):] = 0.0
    x_j = jnp.asarray(x)[lvl.order]   # sorted space
    extent = r * 2.0 / 2.5
    cot = jnp.asarray(rng.normal(size=(cap, cout)).astype(np.float32))

    def loss_xla(x_in, w_in):
        p = params._replace(weights=w_in)
        out, _ = kpconv(lvl.pts_sorted, lvl.pts_sorted, jnp.asarray(neighb),
                        x_in, p,
                        KP_extent=extent, KP_influence="linear",
                        aggregation_mode="sum")
        return jnp.sum(out * cot)

    neighb_sorted = jnp.asarray(neighb).T

    qk = lvl.key_sorted.reshape(-1, T)
    valid = qk < 2 * SortedLevel.KOFF
    kmin = jnp.min(jnp.where(valid, qk, jnp.float32(3e37)), axis=1)
    starts = jnp.minimum(
        jnp.searchsorted(
            lvl.key_sorted, kmin - (r + SortedLevel.EPS)
        ).astype(jnp.int32), cap)

    def loss_band(x_in, w_in):
        x_sorted = jnp.concatenate([
            x_in, jnp.zeros((lvl.band_pad, cin), jnp.float32)])
        out_sorted = band_conv_ad(
            BAND, T, False, "float32",   # interpret=False: real Mosaic
            lvl.q_packed, neighb_sorted, lvl.s_packed,
            x_sorted, w_in, params.kernel_points, starts,
            jnp.float32(extent), None,
        )
        return jnp.sum(out_sorted[:cap] * cot)

    v_ref, (gx_ref, gw_ref) = jax.jit(
        jax.value_and_grad(loss_xla, argnums=(0, 1)))(x_j, params.weights)
    v_b, (gx_b, gw_b) = jax.jit(
        jax.value_and_grad(loss_band, argnums=(0, 1)))(x_j, params.weights)

    # tolerances: the chunked kernels accumulate in 256-row partial sums
    # (8x more dot calls than XLA's single contraction), each with its own
    # MXU pass rounding — measured value rel ~3e-4, dW norm ratio ~9e-4 on
    # near-cancelling sums. LOGIC exactness (selection windows, chunk
    # gating, aliasing) is asserted at 3e-5 by the interpret-mode twins in
    # tests/test_band_conv*; dx — the signal that propagates through the
    # network during training — stays at 3e-5 norm ratio here. A window /
    # double-count bug shows up orders of magnitude above these bounds.
    np.testing.assert_allclose(float(v_b), float(v_ref), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(gx_b)[: len(pts)], np.asarray(gx_ref)[: len(pts)],
        atol=1e-3, rtol=1e-3,
    )
    gw_b, gw_ref = np.asarray(gw_b), np.asarray(gw_ref)
    rel = np.linalg.norm(gw_b - gw_ref) / np.linalg.norm(gw_ref)
    assert rel < 3e-3, f"dW norm-relative error {rel}"
    np.testing.assert_allclose(gw_b, gw_ref, atol=1e-1, rtol=2e-2)
