"""100-step synthetic training run on the real TPU: loss/accuracy curves."""
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.loader import PairLoader
from d3feat_tpu.data.synthetic import SyntheticPairDataset
from d3feat_tpu.train.step import init_train_state, make_train_step

cfg = D3FeatConfig()
cfg.caps = PyramidCaps(points=(16384, 8192, 2048, 768, 256),
                       neighbors=(40,)*5, corr=128)
cfg.query_tile = 512
ds = SyntheticPairDataset(size=32, n_points=7000, num_corr=128, seed=0,
                          extent=3.0)
loader = PairLoader(ds, point_capacity=16384, corr_capacity=128,
                    num_devices=1, num_workers=4, seed=0)
ts, specs = init_train_state(jax.random.key(0), cfg)
step = jax.jit(make_train_step(cfg, specs))

t0 = time.perf_counter()
it = 0
for epoch in range(4):
    for batch in loader:
        b = {k: jnp.asarray(v[0]) for k, v in batch.items()}
        ts, m = step(ts, b, jnp.int32(epoch))
        it += 1
        if it % 16 == 0:
            print(f"iter {it}: loss {float(m.loss):.4f} desc {float(m.desc_loss):.4f} "
                  f"det {float(m.det_loss):+.4f} acc {float(m.accuracy):.1f}% "
                  f"skip {float(m.skipped)} ovf {float(m.overflow)}", flush=True)
print(f"total {it} steps in {time.perf_counter()-t0:.1f}s "
      f"(incl. compile), final step count {int(ts.step)}", flush=True)
