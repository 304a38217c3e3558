"""Per-block warm timing of the KPFCNN forward on TPU."""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_single
from d3feat_tpu.data.synthetic import synthetic_fragment
from d3feat_tpu.ops.pyramid import build_pyramid, make_pyramid_spec
from d3feat_tpu.train.step import init_train_state
from d3feat_tpu.models.blocks import apply_block

def timeit(fn, *args, iters=30):
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

x = feats.astype(jnp.float32) * np.asarray(pyr["masks"][0])[:, None]
total = 0.0
for part, blocks in (("enc", specs.encoder), ("dec", specs.decoder)):
    for i, sp in enumerate(blocks):
        params = ts.params["encoder" if part=="enc" else "decoder"][i]
        state = ts.model_state["encoder" if part=="enc" else "decoder"][i]
        if part == "dec" and i in specs.decoder_concats:
            # fake the concat width
            skipdim = sp.in_dim - x.shape[1]
            x = jnp.concatenate([x, jnp.zeros((x.shape[0], skipdim))], axis=1)
        fn = jax.jit(lambda p, s, xx, sp=sp: apply_block(
            p, s, sp, xx, pyr, cfg, train=False)[0])
        dt = timeit(fn, params, state, x)
        total += dt
        print(f"{part}[{i}] {sp.name} L{sp.layer} in={sp.in_dim} out={sp.out_dim}: "
              f"{dt*1e3:.2f} ms", flush=True)
        x = fn(params, state, x)
print(f"sum of blocks: {total*1e3:.1f} ms", flush=True)
