"""Profile the warm serving extract step; aggregate perfetto events."""
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
from d3feat_tpu.data.pack import pack_fragments
from d3feat_tpu.data.synthetic import scan_fragment
from d3feat_tpu.train.step import init_train_state, make_extract_step

cfg = D3FeatConfig()
cfg.caps = PyramidCaps(points=(16384, 8192, 2048, 768, 256),
                       neighbors=(40,) * 5, corr=128)
cfg.query_tile = 512

rng = np.random.default_rng(0)
f = scan_fragment(rng)
while not (12000 <= len(f) <= 16000):
    f = scan_fragment(rng)
b = pack_fragments([f], point_capacity=16384, num_clouds=2)
batch = {k: jnp.asarray(v) for k, v in b.items()}

ts, specs = init_train_state(jax.random.key(0), cfg)
extract = jax.jit(make_extract_step(cfg, specs, num_clouds=2))

out = extract(ts.params, ts.model_state, batch)
jax.block_until_ready(out)
print("warm-up done", flush=True)

TRACE = "/tmp/jtrace_extract"
os.system(f"rm -rf {TRACE}")
jax.profiler.start_trace(TRACE)
for _ in range(5):
    out = extract(ts.params, ts.model_state, batch)
jax.block_until_ready(out)
jax.profiler.stop_trace()

files = glob.glob(f"{TRACE}/**/*.trace.json.gz", recursive=True)
ev = json.load(gzip.open(files[0]))["traceEvents"]
agg = defaultdict(float)
cnt = defaultdict(int)
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        agg[e.get("name", "?")] += e["dur"]
        cnt[e.get("name", "?")] += 1
rows = sorted(agg.items(), key=lambda kv: -kv[1])
print(f"{'us_total':>12} {'n':>5}  name (5 steps)")
for name, us in rows[:40]:
    print(f"{us:12.0f} {cnt[name]:5d}  {name[:110]}")
