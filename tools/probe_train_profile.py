"""Profile the warm train step on the real TPU: aggregate perfetto events."""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_pair
from d3feat_tpu.data.synthetic import scan_pair
from d3feat_tpu.train.step import init_train_state, make_train_step

cfg = D3FeatConfig()
cfg.caps = PyramidCaps(points=(32768, 16384, 4096, 1536, 512),
                       neighbors=(40,) * 5, corr=128)
cfg.query_tile = 512

rng = np.random.default_rng(0)
pts0, pts1, corr, dk = scan_pair(rng, num_corr=128)
while not (9000 < len(pts0) < 15500 and 9000 < len(pts1) < 15500):
    pts0, pts1, corr, dk = scan_pair(rng, num_corr=128)
p = pack_pair(pts0, pts1, np.ones((len(pts0), 1), np.float32),
              np.ones((len(pts1), 1), np.float32), corr, dk,
              point_capacity=32768, corr_capacity=128)
batch = {k: jnp.asarray(v) for k, v in {
    "points": p.points, "features": p.features, "lengths": p.lengths,
    "corr": p.corr, "corr_valid": p.corr_valid,
    "dist_keypts": p.dist_keypts}.items()}

ts, specs = init_train_state(jax.random.key(0), cfg)
step = jax.jit(make_train_step(cfg, specs))

ts2, m = step(ts, batch, jnp.int32(0))
jax.block_until_ready(ts2.params)
print("warm-up done, loss", float(m.loss))

TRACE = "/tmp/jtrace_train"
os.system(f"rm -rf {TRACE}")
jax.profiler.start_trace(TRACE)
for _ in range(3):
    ts2, m = step(ts2, batch, jnp.int32(0))
jax.block_until_ready(ts2.params)
jax.profiler.stop_trace()

files = glob.glob(f"{TRACE}/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
ev = json.load(gzip.open(files[0]))["traceEvents"]
agg = defaultdict(float)
cnt = defaultdict(int)
total = 0.0
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        name = e.get("name", "?")
        pidname = e.get("pid")
        agg[name] += e["dur"]
        cnt[name] += 1
# keep only device-stream-looking events: heuristic — drop python/host rows
rows = sorted(agg.items(), key=lambda kv: -kv[1])
print(f"{'us_total':>12} {'n':>5}  name")
for name, us in rows[:45]:
    print(f"{us:12.0f} {cnt[name]:5d}  {name[:110]}")
