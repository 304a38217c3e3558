import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_single
from d3feat_tpu.data.synthetic import synthetic_fragment
from d3feat_tpu.train.step import init_train_state, make_extract_step

rng = np.random.default_rng(0)
cfg = D3FeatConfig()
cfg.caps = PyramidCaps(points=(16384, 8192, 2048, 768, 256), neighbors=(40,)*5, corr=128)
cfg.query_tile = 512
ts, specs = init_train_state(jax.random.key(0), cfg)
extract = jax.jit(make_extract_step(cfg, specs))

def mk():
    pts = synthetic_fragment(rng, 15000, extent=3.0)
    b = pack_single(pts, np.ones((15000,1),np.float32), point_capacity=16384)
    return {k: jnp.asarray(v) for k, v in b.items()}

for nb in (1, 2, 8):
    batches = [mk() for _ in range(nb)]
    for b in batches:
        jax.block_until_ready(extract(ts.params, ts.model_state, b))
    t0 = time.perf_counter()
    N = 20
    for i in range(N):
        out = extract(ts.params, ts.model_state, batches[i % nb])
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/N
    print(f"distinct={nb}: {dt*1e3:.1f} ms = {1/dt:.1f} frags/s", flush=True)
