"""Pallas fused select vs XLA banded on the real TPU."""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from d3feat_tpu.data.pack import pack_single
from d3feat_tpu.data.synthetic import synthetic_fragment
from d3feat_tpu.ops.neighbors import radius_neighbors_banded, radius_neighbors_pallas

def timeit(fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

rng = np.random.default_rng(0)
pts = synthetic_fragment(rng, 15000, extent=3.0)
b = pack_single(pts, np.ones((15000,1),np.float32), point_capacity=16384)
points = jnp.asarray(b["points"]); lengths = jnp.asarray(b["lengths"])
r0 = 0.075

t0=time.perf_counter()
f_b = lambda: radius_neighbors_banded(points, points, lengths, lengths, r0,
                                      max_k=40, num_clouds=2, query_tile=512, band_cap=2048)
idx_b, ov_b = f_b()
jax.block_until_ready(idx_b)
print(f"banded compile: {time.perf_counter()-t0:.1f}s; run {timeit(f_b)*1e3:.1f} ms ov={bool(ov_b)}", flush=True)

for T, BAND in ((256, 2048), (512, 2048), (256, 1024)):
    t0=time.perf_counter()
    f_p = lambda T=T, BAND=BAND: radius_neighbors_pallas(
        points, points, lengths, lengths, r0,
        max_k=40, num_clouds=2, query_tile=T, band_cap=BAND)
    try:
        idx_p, ov_p = f_p()
        jax.block_until_ready(idx_p)
        c = time.perf_counter()-t0
        # correctness vs banded
        match = float(jnp.mean((jnp.sort(idx_p, 1) == jnp.sort(idx_b, 1)).astype(jnp.float32)))
        print(f"pallas T={T} band={BAND}: compile {c:.1f}s; run {timeit(f_p)*1e3:.1f} ms "
              f"ov={bool(ov_p)} match={match:.5f}", flush=True)
    except Exception as e:
        print(f"pallas T={T} band={BAND}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
