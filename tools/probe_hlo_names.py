"""Dump compiled HLO for the extract step; map big fusions to source ops."""
import os, sys, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

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
txt = extract.lower(ts.params, ts.model_state, batch).compile().as_text()
open("/tmp/extract_hlo.txt", "w").write(txt)
print("bytes:", len(txt))

# print the fusion roots + metadata for the names we care about
want = re.compile(r'^\s*(ENTRY )?%?(fusion\.(71|13|61|62|82|81|157)|select_reduce_fusion(\.\d+)?) ')
for m in re.finditer(r'%(fusion\.(?:71|13|61|62|82|81|157|11|4|9|7|6)|select_reduce_fusion(?:\.\d+)?) = [^\n]*', txt):
    print(m.group(0)[:400]); print()
