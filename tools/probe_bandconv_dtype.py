"""Time ONLY the band_conv kernel per panel dtype at serving L0 shape."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from d3feat_tpu.models.kernel_points import load_kernels
from d3feat_tpu.models.kpconv import init_kpconv
from d3feat_tpu.ops.neighbors import (
    SortedLevel, make_level_frame, radius_neighbors_sorted)
from d3feat_tpu.ops.pallas.band_conv import band_conv
from d3feat_tpu.data.synthetic import scan_fragment

rng = np.random.default_rng(0)
f = scan_fragment(rng)
while not (12000 <= len(f) <= 16000):
    f = scan_fragment(rng)
N = len(f)
cap = 16384
padded = np.full((cap, 3), 1.0e6, np.float32)
padded[:N] = f
lens = np.array([N, 0], np.int32)
pts_j = jnp.asarray(padded)
lens_j = jnp.asarray(lens)
axis, origin = make_level_frame(pts_j, lens_j, 2)
BANDP = 2048
lvl = SortedLevel(pts_j, lens_j, 2, axis, origin, band_pad=BANDP)
r, K = 0.075, 40
neighb, ov = radius_neighbors_sorted(
    lvl, lvl, r, max_k=K, query_tile=256, band_cap=BANDP,
    raw_positions=True)
print("overflow:", bool(ov), flush=True)
neighb_sorted = jnp.asarray(neighb).T
T = 256
qk = lvl.key_sorted.reshape(-1, T)
valid = qk < 2 * SortedLevel.KOFF
kmin = jnp.min(jnp.where(valid, qk, jnp.float32(3e37)), axis=1)
starts = jnp.minimum(jnp.searchsorted(
    lvl.key_sorted, kmin - (r + 0.02), method="sort").astype(jnp.int32), cap)
kp = load_kernels(r, 15, deterministic=True).astype(np.float32)
extent = r * 2.0 / 2.5

for cin, cout in ((128, 128),):
    params = init_kpconv(jax.random.key(0), 15, cin, cout, kp)
    x = np.abs(rng.normal(size=(cap, cin))).astype(np.float32)
    x[N:] = 0.0
    x_sorted = jnp.concatenate(
        [jnp.asarray(x)[lvl.order], jnp.zeros((BANDP, cin), jnp.float32)])
    outs = {}
    for pdt in ("float32", "bfloat16"):
        args = (lvl.q_packed, neighb_sorted, lvl.s_packed, x_sorted,
                params.weights, params.kernel_points, starts,
                jnp.float32(extent))
        kw = dict(band_cap=BANDP, query_tile=T, panel_dtype=pdt)
        t0 = time.perf_counter()
        out = band_conv(*args, **kw)[0]
        jax.block_until_ready(out)
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(30):
            out = band_conv(*args, **kw)[0]
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 30 * 1e3
        outs[pdt] = np.asarray(out)[:N]
        print(f"cin={cin} cout={cout} {pdt}: compile {c:.1f}s, "
              f"band {dt:.2f} ms", flush=True)
    rel = (np.linalg.norm(outs["bfloat16"] - outs["float32"])
           / np.linalg.norm(outs["float32"]))
    print(f"bf16 vs f32 rel err: {rel:.2e}", flush=True)
