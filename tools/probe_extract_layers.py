import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_single
from d3feat_tpu.data.synthetic import synthetic_fragment
from d3feat_tpu.train.step import init_train_state, make_extract_step

max_layer = int(sys.argv[1])
rng = np.random.default_rng(0)
pts = synthetic_fragment(rng, 15000, extent=3.0)
b = pack_single(pts, np.ones((15000,1),np.float32), point_capacity=16384)
batch = {k: jnp.asarray(v) for k, v in b.items()}
cfg = D3FeatConfig()
cfg.caps = PyramidCaps(points=(16384, 8192, 2048, 768, 256), neighbors=(40,)*5, corr=128)
cfg.query_tile = 512
cfg.bandconv_max_layer = max_layer
ts, specs = init_train_state(jax.random.key(0), cfg)
extract = jax.jit(make_extract_step(cfg, specs))
try:
    out = extract(ts.params, ts.model_state, batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = extract(ts.params, ts.model_state, batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/20
    print(f"max_layer={max_layer}: OK {dt*1e3:.1f} ms = {1/dt:.1f} frags/s", flush=True)
except Exception as e:
    print(f"max_layer={max_layer}: FAILED {str(e)[-160:]}", flush=True)
