"""Section timing on the real TPU: pyramid vs network vs head."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_fragments
from d3feat_tpu.data.synthetic import scan_fragment
from d3feat_tpu.models import apply_kpfcnn, make_kpfcnn_specs
from d3feat_tpu.ops import build_pyramid, make_pyramid_spec
from d3feat_tpu.train.step import init_train_state

cfg = D3FeatConfig()
cfg.caps = PyramidCaps(points=(16384, 8192, 2048, 768, 256),
                       neighbors=(40,)*5, corr=128)
cfg.query_tile = 512
ts, specs = init_train_state(jax.random.key(0), cfg)
spec = make_pyramid_spec(cfg, num_clouds=2)

rng = np.random.default_rng(0)
f = scan_fragment(rng)
while not (14000 <= len(f) <= 15500):
    f = scan_fragment(rng)
b = pack_fragments([f], point_capacity=16384, num_clouds=2)
pts, lens = jnp.asarray(b["points"]), jnp.asarray(b["lengths"])
feats = jnp.asarray(b["features"])

pyr_fn = jax.jit(lambda p, l: build_pyramid(p, l, spec=spec))

def net(params, state, pyr):
    full = dict(pyr); full["features"] = feats
    out, _, _ = apply_kpfcnn(params, state, full, cfg, specs, train=False,
                             per_cloud_norm=True)
    return out.features, out.scores
net_fn = jax.jit(net)

def timed(fn, *a, n=20):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000, out

t_pyr, pyr = timed(pyr_fn, pts, lens)
print(f"pyramid: {t_pyr:.2f} ms  overflow={bool(pyr['overflow'])}")
pyr = {k: v for k, v in pyr.items() if k != "overflow"}
t_net, _ = timed(net_fn, ts.params, ts.model_state, pyr)
print(f"network+head: {t_net:.2f} ms")

# full fused program
def full_fn(params, state, p, l):
    pyr = build_pyramid(p, l, spec=spec)
    fullb = dict(pyr); fullb["features"] = feats
    out, _, _ = apply_kpfcnn(params, state, fullb, cfg, specs, train=False,
                             per_cloud_norm=True)
    return out.features, out.scores, pyr["overflow"]
t_full, _ = timed(jax.jit(full_fn), ts.params, ts.model_state, pts, lens)
print(f"full extract: {t_full:.2f} ms = {1000.0/t_full:.1f} fragments/s")
