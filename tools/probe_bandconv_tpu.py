"""Compile/run band_conv on TPU per block shape; check vs XLA kpconv."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from d3feat_tpu.models.kernel_points import load_kernels
from d3feat_tpu.models.kpconv import init_kpconv, kpconv
from d3feat_tpu.ops.neighbors import SortedLevel, make_level_frame, radius_neighbors_sorted
from d3feat_tpu.ops.pallas.band_conv import band_conv
from d3feat_tpu.data.synthetic import synthetic_fragment

rng = np.random.default_rng(0)
N = 15000; cap = 16384
pts = synthetic_fragment(rng, N, extent=3.0)
padded = np.full((cap, 3), 1.0e6, np.float32); padded[:N] = pts
lens = np.array([N, 0], np.int32)
pts_j = jnp.asarray(padded); lens_j = jnp.asarray(lens)
axis, origin = make_level_frame(pts_j, lens_j, 2)
BANDP = 1792
lvl = SortedLevel(pts_j, lens_j, 2, axis, origin, band_pad=BANDP)
r, K = 0.075, 40
neighb, ov = radius_neighbors_sorted(lvl, lvl, r, max_k=K, query_tile=128, band_cap=BANDP,
                                     raw_positions=True)
print("search ok, overflow:", bool(ov), flush=True)
neighb_sorted = jnp.asarray(neighb).T  # sorted-space: rows sorted, values=positions
qk = lvl.key_sorted.reshape(-1, 128)
valid = qk < 2 * SortedLevel.KOFF
kmin = jnp.min(jnp.where(valid, qk, jnp.float32(3e37)), axis=1)
starts = jnp.minimum(jnp.searchsorted(lvl.key_sorted, kmin - (r + 0.02)).astype(jnp.int32), cap)
kp = load_kernels(r, 15, deterministic=True).astype(np.float32)
extent = r * 2.0 / 2.5

for cin, cout, pdt in ((1, 64, "float32"), (1, 64, "bfloat16"),
                       (64, 64, "float32"), (64, 64, "bfloat16"),
                       (128, 128, "float32"), (128, 128, "bfloat16")):
    params = init_kpconv(jax.random.key(0), 15, cin, cout, kp)
    x = rng.normal(size=(cap, cin)).astype(np.float32); x[N:] = 0.0
    x = np.abs(x)  # positive like post-relu
    x_j = jnp.asarray(x)
    x_sorted = jnp.concatenate([x_j[lvl.order], jnp.zeros((BANDP, cin), jnp.float32)])
    t0 = time.perf_counter()
    try:
        out_sorted = band_conv(lvl.q_packed, neighb_sorted, lvl.s_packed,
                               x_sorted, params.weights,
                               params.kernel_points, starts, jnp.float32(extent),
                               band_cap=BANDP, query_tile=128,
                               panel_dtype=pdt)
        jax.block_until_ready(out_sorted)
        c = time.perf_counter() - t0
        ref, _ = kpconv(lvl.pts_sorted, lvl.pts_sorted, jnp.asarray(neighb),
                        x_sorted[:cap], params,
                        KP_extent=extent, KP_influence="linear", aggregation_mode="sum")
        out = np.asarray(out_sorted[lvl.inv])[:N]
        err = np.abs(out - np.asarray(ref[lvl.inv])[:N]).max()
        t0 = time.perf_counter()
        for _ in range(20):
            out_sorted = band_conv(lvl.q_packed, neighb_sorted, lvl.s_packed,
                                   x_sorted, params.weights,
                                   params.kernel_points, starts, jnp.float32(extent),
                                   band_cap=BANDP, query_tile=128,
                                   panel_dtype=pdt)
        jax.block_until_ready(out_sorted)
        # XLA reference timing
        t1 = time.perf_counter()
        for _ in range(20):
            ref, _ = kpconv(lvl.pts_sorted, lvl.pts_sorted, jnp.asarray(neighb),
                            x_sorted[:cap], params,
                            KP_extent=extent, KP_influence="linear", aggregation_mode="sum")
        jax.block_until_ready(ref)
        t2 = time.perf_counter()
        print(f"cin={cin} cout={cout} {pdt}: compile {c:.1f}s, "
              f"band {(t1-t0)/20*1e3:.2f} ms, "
              f"xla {(t2-t1)/20*1e3:.2f} ms, maxerr {err:.2e}", flush=True)
    except Exception as e:
        print(f"cin={cin} cout={cout} {pdt}: FAILED {str(e)[:160]}",
              flush=True)
