import time, functools
import jax, jax.numpy as jnp, numpy as np
from d3feat_tpu.data.pack import pack_single
from d3feat_tpu.data.synthetic import synthetic_fragment
from d3feat_tpu.ops.neighbors import radius_neighbors_banded

rng = np.random.default_rng(0)
pts = synthetic_fragment(rng, 15000, extent=3.0)
b = pack_single(pts, np.ones((15000,1),np.float32), point_capacity=16384)
points = jnp.asarray(b["points"]); lengths = jnp.asarray(b["lengths"])
f = functools.partial(radius_neighbors_banded.__wrapped__, max_k=40, num_clouds=2,
                      query_tile=512, band_cap=2048)
t0=time.perf_counter()
jax.jit(f).lower(points, points, lengths, lengths, 0.075).compile()
print(f"clean compile of real banded: {time.perf_counter()-t0:.1f}s", flush=True)
