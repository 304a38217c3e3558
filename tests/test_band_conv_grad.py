"""Custom-VJP band-conv gradients vs the XLA KPConv autodiff (interpret).

The reference's hot loop is KPConv forward AND backward every iteration
(reference: models/blocks.py:237-387 + trainer.py:103); the fused band
kernels therefore define a custom VJP (ops/pallas/band_conv.band_conv_ad)
so training stays on the MXU too. These tests pin its gradients to the XLA
gather implementation's autodiff.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from d3feat_tpu.models.kernel_points import load_kernels
from d3feat_tpu.models.kpconv import init_kpconv, kpconv
from d3feat_tpu.ops.neighbors import (
    SortedLevel,
    make_level_frame,
    radius_neighbors_sorted,
)
from d3feat_tpu.ops.pallas.band_conv import band_conv_ad


def test_band_conv_ad_grads_match_xla_kpconv():
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
    # both implementations run in sorted space on identical inputs
    x_j = jnp.asarray(x)[lvl.order]
    extent = r * 2.0 / 2.5
    # random cotangent against both implementations
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
    starts = jnp.searchsorted(
        lvl.key_sorted, kmin - (r + SortedLevel.EPS)).astype(jnp.int32)
    starts = jnp.minimum(starts, cap)

    def loss_band(x_in, w_in):
        x_sorted = jnp.concatenate([
            x_in, jnp.zeros((lvl.band_pad, cin), jnp.float32)])
        out_sorted = band_conv_ad(
            BAND, T, True, "float32",
            lvl.q_packed, neighb_sorted, lvl.s_packed,
            x_sorted, w_in, params.kernel_points, starts,
            jnp.float32(extent), None,
        )
        return jnp.sum(out_sorted[:cap] * cot)

    v_ref, (gx_ref, gw_ref) = jax.value_and_grad(loss_xla, argnums=(0, 1))(
        x_j, params.weights)
    v_b, (gx_b, gw_b) = jax.value_and_grad(loss_band, argnums=(0, 1))(
        x_j, params.weights)

    np.testing.assert_allclose(float(v_b), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gx_b)[: len(pts)], np.asarray(gx_ref)[: len(pts)],
        atol=5e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(gw_b), np.asarray(gw_ref), atol=5e-4, rtol=1e-3,
    )


def test_kpfcnn_train_grads_band_vs_xla():
    """End-to-end: whole-network value_and_grad, band path vs XLA path
    (covers strided blocks, permutes, density norm, skip connections)."""
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
    pyr_plain = dict(pyr)
    pyr_plain["band"] = {}

    params, state, specs = init_kpfcnn(jax.random.key(0), cfg)
    total = int(np.sum(np.asarray(packed.lengths)))
    mask = (jnp.arange(512) < total).astype(jnp.float32)[:, None]

    def loss(p, batch):
        out, _, _ = apply_kpfcnn(p, state, batch, cfg, specs, train=True)
        return jnp.sum(out.features * mask) + 10.0 * jnp.sum(
            out.scores * mask)

    v_b, g_b = jax.value_and_grad(loss)(params, pyr)
    v_x, g_x = jax.value_and_grad(loss)(params, pyr_plain)

    np.testing.assert_allclose(float(v_b), float(v_x), rtol=1e-3)
    from jax.flatten_util import ravel_pytree

    flat_b, _ = ravel_pytree(g_b)
    flat_x, _ = ravel_pytree(g_x)
    np.testing.assert_allclose(
        np.asarray(flat_b), np.asarray(flat_x), atol=5e-3, rtol=5e-3,
    )
