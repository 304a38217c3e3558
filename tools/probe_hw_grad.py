"""Band-conv fwd+bwd vs XLA on real hardware: print error magnitudes."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from d3feat_tpu.models.kernel_points import load_kernels
from d3feat_tpu.models.kpconv import init_kpconv, kpconv
from d3feat_tpu.ops.neighbors import (
    SortedLevel, make_level_frame, radius_neighbors_sorted)
from d3feat_tpu.ops.pallas.band_conv import band_conv_ad

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
neighb, ov = radius_neighbors_sorted(
    lvl, lvl, r, max_k=k, query_tile=T, band_cap=BAND, raw_positions=True)
assert not bool(ov)

kp = load_kernels(r, kpn, deterministic=True).astype(np.float32)
params = init_kpconv(jax.random.key(0), kpn, cin, cout, kp)
x = rng.normal(size=(cap, cin)).astype(np.float32)
x[len(pts):] = 0.0
x_j = jnp.asarray(x)[lvl.order]
extent = r * 2.0 / 2.5
cot = jnp.asarray(rng.normal(size=(cap, cout)).astype(np.float32))


def loss_xla(x_in, w_in):
    p = params._replace(weights=w_in)
    out, _ = kpconv(lvl.pts_sorted, lvl.pts_sorted, jnp.asarray(neighb),
                    x_in, p, KP_extent=extent, KP_influence="linear",
                    aggregation_mode="sum")
    return jnp.sum(out * cot)


neighb_sorted = jnp.asarray(neighb).T
qk = lvl.key_sorted.reshape(-1, T)
valid = qk < 2 * SortedLevel.KOFF
kmin = jnp.min(jnp.where(valid, qk, jnp.float32(3e37)), axis=1)
starts = jnp.minimum(
    jnp.searchsorted(lvl.key_sorted, kmin - (r + SortedLevel.EPS)
                     ).astype(jnp.int32), cap)


def loss_band(x_in, w_in):
    x_sorted = jnp.concatenate(
        [x_in, jnp.zeros((lvl.band_pad, cin), jnp.float32)])
    out_sorted = band_conv_ad(
        BAND, T, False, "float32",
        lvl.q_packed, neighb_sorted, lvl.s_packed,
        x_sorted, w_in, params.kernel_points, starts, jnp.float32(extent),
        None)
    return jnp.sum(out_sorted[:cap] * cot)


v_ref, (gx_ref, gw_ref) = jax.jit(
    jax.value_and_grad(loss_xla, argnums=(0, 1)))(x_j, params.weights)
v_b, (gx_b, gw_b) = jax.jit(
    jax.value_and_grad(loss_band, argnums=(0, 1)))(x_j, params.weights)

gx_b, gx_ref = np.asarray(gx_b)[:len(pts)], np.asarray(gx_ref)[:len(pts)]
gw_b, gw_ref = np.asarray(gw_b), np.asarray(gw_ref)
print("value:", float(v_b), float(v_ref), "absdiff", abs(float(v_b) - float(v_ref)))
print("gx: max abs diff", np.abs(gx_b - gx_ref).max(),
      "norm ratio", np.linalg.norm(gx_b - gx_ref) / np.linalg.norm(gx_ref))
print("gw: max abs diff", np.abs(gw_b - gw_ref).max(),
      "norm ratio", np.linalg.norm(gw_b - gw_ref) / np.linalg.norm(gw_ref))
bad = np.argwhere(np.abs(gw_b - gw_ref) >
                  0.001 + 0.001 * np.abs(gw_ref))
print("gw elements over (1e-3,1e-3):", len(bad), "of", gw_b.size)
for idx in bad[:10]:
    i, j, l = idx
    print("  kp=%d c=%d cout=%d band=%.6f ref=%.6f" %
          (i, j, l, gw_b[i, j, l], gw_ref[i, j, l]))
