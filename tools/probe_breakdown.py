"""Warm-time breakdown of the extract pipeline on TPU."""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_single
from d3feat_tpu.data.synthetic import synthetic_fragment
from d3feat_tpu.ops.pyramid import build_pyramid, make_pyramid_spec
from d3feat_tpu.ops.subsample import voxel_subsample
from d3feat_tpu.train.step import init_train_state, make_extract_step
from d3feat_tpu.models import apply_kpfcnn

def timeit(fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

rng = np.random.default_rng(0)
pts = synthetic_fragment(rng, 15000, extent=3.0)
b = pack_single(pts, np.ones((15000,1),np.float32), point_capacity=16384)
points = jnp.asarray(b["points"]); feats = jnp.asarray(b["features"]); lengths = jnp.asarray(b["lengths"])

cfg = D3FeatConfig()
cfg.caps = PyramidCaps(points=(16384, 8192, 2048, 768, 256),
                       neighbors=(40, 40, 40, 40, 40), corr=128)
cfg.query_tile = 512
spec = make_pyramid_spec(cfg)

f_pyr = lambda: build_pyramid(points, lengths, spec=spec)
pyr = f_pyr()
print(f"pyramid: {timeit(f_pyr)*1e3:.1f} ms", flush=True)

# subsamples alone
p_l, l_l = points, lengths
sub_t = 0.0
r0 = 0.075
for l in range(4):
    f_sub = lambda p=p_l, ln=l_l, dl=2*r0*(2**l)/2.5, cap=spec.point_caps[l+1]: \
        voxel_subsample(p, ln, dl, out_capacity=cap, num_clouds=2)
    s = f_sub()
    dt = timeit(f_sub)
    sub_t += dt
    print(f"  subsample L{l}->{l+1}: {dt*1e3:.1f} ms", flush=True)
    p_l, l_l = s.points, s.lengths
print(f"subsample total: {sub_t*1e3:.1f} ms", flush=True)

ts, specs = init_train_state(jax.random.key(0), cfg)
extract = jax.jit(make_extract_step(cfg, specs))
batch = {"points": points, "features": feats, "lengths": lengths}
f_ex = lambda: extract(ts.params, ts.model_state, batch)
print(f"extract: {timeit(f_ex)*1e3:.1f} ms", flush=True)

# network-only (pyramid precomputed; static input)
pyr_const = jax.tree.map(lambda x: x, pyr)
@jax.jit
def net_only(params, mstate, pyrd, f):
    full = dict(pyrd); full["features"] = f
    out, _, _ = apply_kpfcnn(params, mstate, full, cfg, specs, train=False,
                             per_cloud_norm=True)
    return out.features, out.scores
f_net = lambda: net_only(ts.params, ts.model_state, pyr_const, feats)
print(f"network only: {timeit(f_net)*1e3:.1f} ms", flush=True)
