"""Full training step on the real TPU: correctness + pairs/s."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_pair
from d3feat_tpu.data.synthetic import scan_pair
from d3feat_tpu.train.step import init_train_state, make_train_step

cfg = D3FeatConfig()
if "--bf16" in sys.argv:
    cfg.compute_dtype = "bfloat16"
cfg.caps = PyramidCaps(points=(32768, 16384, 4096, 1536, 512),
                       neighbors=(40,)*5, corr=128)
cfg.query_tile = 512

rng = np.random.default_rng(0)
batches = []
for i in range(6):
    pts0, pts1, corr, dk = scan_pair(rng, num_corr=128)
    while not (9000 < len(pts0) < 15500 and 9000 < len(pts1) < 15500):
        pts0, pts1, corr, dk = scan_pair(rng, num_corr=128)
    p = pack_pair(pts0, pts1, np.ones((len(pts0),1),np.float32),
                  np.ones((len(pts1),1),np.float32), corr, dk,
                  point_capacity=32768, corr_capacity=128)
    batches.append({k: jnp.asarray(v) for k, v in {
        "points": p.points, "features": p.features, "lengths": p.lengths,
        "corr": p.corr, "corr_valid": p.corr_valid, "dist_keypts": p.dist_keypts,
    }.items()})

ts, specs = init_train_state(jax.random.key(0), cfg)
step = jax.jit(make_train_step(cfg, specs))
t0 = time.perf_counter()
ts, m = step(ts, batches[0], jnp.int32(0))
jax.block_until_ready(m.loss)
print(f"train step compile+run: {time.perf_counter()-t0:.1f}s "
      f"loss={float(m.loss):.4f} acc={float(m.accuracy):.1f}% "
      f"skipped={float(m.skipped)} overflow={float(m.overflow)}", flush=True)

losses = []
t0 = time.perf_counter()
N = 12
for i in range(N):
    ts, m = step(ts, batches[i % len(batches)], jnp.int32(0))
jax.block_until_ready(m.loss)
dt = (time.perf_counter() - t0) / N
print(f"train step warm: {dt*1e3:.1f} ms = {1/dt:.2f} pairs/s "
      f"(final loss {float(m.loss):.4f}, step {int(ts.step)})", flush=True)
