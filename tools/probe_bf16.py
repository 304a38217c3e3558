"""Network-only bf16 vs f32; head vs encoder/decoder split."""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_single
from d3feat_tpu.data.synthetic import synthetic_fragment
from d3feat_tpu.ops.pyramid import build_pyramid, make_pyramid_spec
from d3feat_tpu.train.step import init_train_state
from d3feat_tpu.models import apply_kpfcnn
from d3feat_tpu.models.kpfcnn import detection_scores

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
cfg.caps = PyramidCaps(points=(16384, 8192, 2048, 768, 256), neighbors=(40,)*5, corr=128)
cfg.query_tile = 512
spec = make_pyramid_spec(cfg)
pyr = build_pyramid(points, lengths, spec=spec)
pyr = jax.tree.map(lambda x: x, pyr)
ts, specs = init_train_state(jax.random.key(0), cfg)

for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
    @jax.jit
    def net(params, mstate, pyrd, f, dt=dt):
        full = dict(pyrd); full["features"] = f
        out, _, _ = apply_kpfcnn(params, mstate, full, cfg, specs, train=False,
                                 compute_dtype=dt, per_cloud_norm=True)
        return out.features, out.scores
    t = timeit(net, ts.params, ts.model_state, pyr, feats)
    print(f"network {dt_name}: {t*1e3:.1f} ms", flush=True)

# head only
feats32 = jax.random.normal(jax.random.key(1), (16384, 32))
@jax.jit
def head(pyrd, f):
    return detection_scores(pyrd, f, train=False, per_cloud_norm=True)
print(f"detector head: {timeit(head, pyr, feats32)*1e3:.1f} ms", flush=True)
