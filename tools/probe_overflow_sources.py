"""Which pyramid capacity overflows on scan-pair training data?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_pair
from d3feat_tpu.data.synthetic import scan_pair
from d3feat_tpu.ops import build_pyramid, make_pyramid_spec

cfg = D3FeatConfig()
cfg.caps = PyramidCaps(points=(32768, 20480, 6144, 2048, 768),
                       neighbors=(40,) * 5, corr=128)
cfg.query_tile = 512
spec = make_pyramid_spec(cfg, num_clouds=2)


@jax.jit
def flags(points, lengths):
    pyr = build_pyramid(points, lengths, spec=spec)
    return {k: v for k, v in pyr["overflow_by"].items()}, [
        l for l in pyr["lengths"]]


from d3feat_tpu.data.synthetic import ScanPairDataset

ds = ScanPairDataset(size=150, num_corr=128, seed=0)  # == the training run
counts = {}
n_over = 0
N = len(ds)
for i in range(N):
    p = ds.packed(i, point_capacity=32768, corr_capacity=128)
    f, lens = flags(jnp.asarray(p.points), jnp.asarray(p.lengths))
    hit = {k: bool(v) for k, v in f.items() if bool(v)}
    if hit:
        n_over += 1
        lv = [np.asarray(x).tolist() for x in lens]
        print(f"pair {i}: lens={np.asarray(p.lengths).tolist()} "
              f"over={sorted(hit)} levels={lv}", flush=True)
        for k in hit:
            counts[k] = counts.get(k, 0) + 1
print(f"\n{n_over}/{N} pairs overflow; by source: {counts}", flush=True)
