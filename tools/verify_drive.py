"""End-to-end package drive (verify skill recipe) on CPU backend.

The real chip is exclusively held by the live corpus4w training run
(round's #1 deliverable) -- the chip-bound drive happens when that run
ends (tests_tpu + bench). This drives the full surface with the
round-4 change active: band-head fused detector head on the TRAINING
path (band_head_ad custom VJP) + double-buffered band DMA, interpret
mode on CPU.
"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.synthetic import synthetic_pair
from d3feat_tpu.data.pack import pack_pair
from d3feat_tpu.ops import build_pyramid, make_pyramid_spec
from d3feat_tpu.models import make_kpfcnn_specs
from d3feat_tpu.train.step import init_train_state, make_train_step

cfg = D3FeatConfig()
cfg.caps = PyramidCaps(points=(2048, 1536, 1024, 512, 256),
                       neighbors=(40,) * 5, corr=32)
cfg.query_tile = 256
assert cfg.bandhead_train  # round-4 change under test

rng = np.random.default_rng(7)
pts0, pts1, corr, dk = synthetic_pair(rng, n_points=900, num_corr=32, extent=2.5)
n = pts0.shape[0]
b = pack_pair(pts0, pts1, np.ones((n, 1), np.float32),
              np.ones((n, 1), np.float32), corr, dk,
              point_capacity=2048, corr_capacity=32)
batch = {k: jnp.asarray(v) for k, v in b._asdict().items()}

spec = make_pyramid_spec(cfg)
pyr = build_pyramid(batch["points"], batch["lengths"], spec=spec)
print("pyramid lengths:", [np.asarray(l).tolist() for l in pyr["lengths"]])
print("overflow:", float(pyr["overflow"]))
assert float(pyr["overflow"]) == 0.0

ts, specs = init_train_state(jax.random.key(0), cfg)
step = jax.jit(make_train_step(cfg, specs))
ts2, m = step(ts, batch, jnp.int32(0))
print("loss:", float(m.loss), "acc:", float(m.accuracy),
      "overflow:", float(m.overflow), "skipped:", float(m.skipped))
assert np.isfinite(float(m.loss)) and float(m.skipped) == 0.0
# params actually moved
moved = max(float(jnp.max(jnp.abs(a - b))) for a, b in
            zip(jax.tree_util.tree_leaves(ts.params),
                jax.tree_util.tree_leaves(ts2.params)))
print("max param delta:", moved)
assert moved > 0

# eval surface: descriptors + scores through the extract step (fused head)
from d3feat_tpu.train.step import make_extract_step
extract = jax.jit(make_extract_step(cfg))
desc, scores, eoverflow = extract(ts.params, ts.model_state, batch)
assert float(eoverflow) == 0.0
lens = np.asarray(pyr["lengths"][0])
valid = int(lens.sum())
norms = np.linalg.norm(np.asarray(desc)[:valid], axis=1)
print("desc norm range (valid rows):", norms.min(), norms.max())
assert np.allclose(norms, 1.0, atol=1e-4)
nz = float((np.asarray(scores)[:valid] > 0).mean())
print("eval score sparsity (frac > 0):", nz)
assert 0.0 < nz < 1.0  # eval local-max gate sparsifies

# degenerate probes (skill): 3-point cloud and 100 identical points
from d3feat_tpu.data.pack import pack_single
for tag, pts in (("3pt", np.array([[0,0,0],[0.5,0,0],[0,0.5,0]], np.float32)),
                 ("100same", np.zeros((100,3), np.float32))):
    pb = pack_single(pts, np.ones((pts.shape[0],1), np.float32),
                     point_capacity=2048)
    pbj = {k: jnp.asarray(v) for k, v in  (pb._asdict() if hasattr(pb, "_asdict") else pb).items()}
    d2, s2, ov = extract(ts.params, ts.model_state, pbj)
    assert np.all(np.isfinite(np.asarray(d2))), tag
    assert np.all(np.isfinite(np.asarray(s2))), tag
    print(tag, "ok; overflow:", float(ov))
print("VERIFY DRIVE OK")
