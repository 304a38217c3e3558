"""Bisect voxel_subsample's on-TPU cost op by op."""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from d3feat_tpu.data.pack import pack_single
from d3feat_tpu.data.synthetic import synthetic_fragment
from d3feat_tpu.ops.subsample import voxel_subsample, lengths_to_cloud_ids

def timeit(fn, *args, iters=30):
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

f_full = lambda: voxel_subsample(points, lengths, 0.06, out_capacity=8192,
                                 num_clouds=2, occupancy_cap=32)
print(f"full subsample: {timeit(f_full)*1e3:.2f} ms", flush=True)

n = 16384
@jax.jit
def keys_and_sort(p, l):
    cid = lengths_to_cloud_ids(l, n)
    valid = cid < 2
    mins = jnp.stack([jnp.min(jnp.where((cid == c)[:, None], p, 1e6), axis=0)
                      for c in range(2)])
    origin = jnp.floor(mins / 0.06) * 0.06
    rel = (p - origin[jnp.minimum(cid, 1)]) / 0.06
    cell = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, (1<<16)-1)
    k_lo = cell[:, 0].astype(jnp.uint32) | (cell[:, 1].astype(jnp.uint32) << 16)
    k_hi = cell[:, 2].astype(jnp.uint32) | (cid.astype(jnp.uint32) << 16)
    order = jnp.lexsort((k_lo, k_hi))
    return order, k_lo[order], k_hi[order]
print(f"keys+lexsort: {timeit(keys_and_sort, points, lengths)*1e3:.2f} ms", flush=True)

order, slo, shi = keys_and_sort(points, lengths)
@jax.jit
def perm_and_runs(p, order, slo, shi):
    s_pts = p[order]
    is_first = jnp.concatenate([jnp.ones((1,), bool),
                                (slo[1:] != slo[:-1]) | (shi[1:] != shi[:-1])])
    seg = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    run_ids = jnp.arange(8192)
    starts = jnp.searchsorted(seg, run_ids)
    ends = jnp.searchsorted(seg, run_ids + 1)
    return s_pts, starts, ends
print(f"perm+runs+searchsorted: {timeit(perm_and_runs, points, order, slo, shi)*1e3:.2f} ms", flush=True)

s_pts, starts, ends = perm_and_runs(points, order, slo, shi)
@jax.jit
def occ_gather(s_pts, starts, ends):
    offs = jnp.arange(32)
    pos = jnp.minimum(starts[:, None] + offs[None, :], n - 1)
    take = (starts[:, None] + offs[None, :]) < ends[:, None]
    g = s_pts[pos.reshape(-1)].reshape(8192, 32, 3)
    return jnp.sum(jnp.where(take[:, :, None], g, 0.0), axis=1)
print(f"occupancy gather+sum: {timeit(occ_gather, s_pts, starts, ends)*1e3:.2f} ms", flush=True)
