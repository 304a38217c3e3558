"""Check persistent compilation cache effectiveness on axon."""
import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from d3feat_tpu.data.pack import pack_single
from d3feat_tpu.data.synthetic import synthetic_fragment
from d3feat_tpu.ops.neighbors import radius_neighbors_banded

rng = np.random.default_rng(0)
pts = synthetic_fragment(rng, 15000, extent=3.0)
b = pack_single(pts, np.ones((15000,1),np.float32), point_capacity=16384)
points = jnp.asarray(b["points"]); lengths = jnp.asarray(b["lengths"])
t0=time.perf_counter()
idx, ov = radius_neighbors_banded(points, points, lengths, lengths, 0.075,
                                  max_k=40, num_clouds=2, query_tile=512, band_cap=2048)
jax.block_until_ready(idx)
print(f"compile+run: {time.perf_counter()-t0:.1f}s")
