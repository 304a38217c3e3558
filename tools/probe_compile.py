"""Stage-by-stage TPU compile/runtime probe for the extraction pipeline."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_single
from d3feat_tpu.data.synthetic import synthetic_fragment
from d3feat_tpu.ops.neighbors import radius_neighbors
from d3feat_tpu.ops.subsample import voxel_subsample
from d3feat_tpu.ops.pyramid import build_pyramid, make_pyramid_spec
from d3feat_tpu.train.step import init_train_state, make_extract_step


def stamp(msg, t0):
    t = time.perf_counter()
    print(f"[{t - t0:8.1f}s] {msg}", flush=True)
    return t


def main():
    t0 = time.perf_counter()
    cfg = D3FeatConfig()
    cfg.caps = PyramidCaps(points=(16384, 8192, 2048, 768, 256),
                           neighbors=(40, 40, 40, 40, 40), corr=128)
    cfg.query_tile = 2048
    n = 15000
    rng = np.random.default_rng(0)
    pts = synthetic_fragment(rng, n, extent=3.0)
    b = pack_single(pts, np.ones((n, 1), np.float32), point_capacity=16384)
    points = jnp.asarray(b["points"])
    feats = jnp.asarray(b["features"])
    lengths = jnp.asarray(b["lengths"])
    stamp("data ready", t0)

    r0 = cfg.first_subsampling_dl * cfg.conv_radius
    nb = radius_neighbors(points, points, lengths, lengths, r0,
                          max_k=40, num_clouds=2, query_tile=2048)
    jax.block_until_ready(nb)
    t = stamp("radius_neighbors L0 compile+run", t0)
    nb = radius_neighbors(points, points, lengths, lengths, r0,
                          max_k=40, num_clouds=2, query_tile=2048)
    jax.block_until_ready(nb)
    stamp("radius_neighbors L0 warm run", t0)

    sub = voxel_subsample(points, lengths, 2 * r0 / cfg.conv_radius,
                          out_capacity=8192, num_clouds=2)
    jax.block_until_ready(sub.points)
    stamp("voxel_subsample compile+run", t0)

    spec = make_pyramid_spec(cfg)
    pyr = build_pyramid(points, lengths, spec=spec)
    jax.block_until_ready(pyr["points"][0])
    stamp("build_pyramid compile+run", t0)
    pyr = build_pyramid(points, lengths, spec=spec)
    jax.block_until_ready(pyr["points"][0])
    stamp("build_pyramid warm run", t0)

    ts, specs = init_train_state(jax.random.key(0), cfg)
    stamp("params init", t0)
    extract = jax.jit(make_extract_step(cfg, specs))
    out = extract(ts.params, ts.model_state,
                  {"points": points, "features": feats, "lengths": lengths})
    jax.block_until_ready(out)
    stamp("extract compile+run", t0)
    for _ in range(5):
        out = extract(ts.params, ts.model_state,
                      {"points": points, "features": feats, "lengths": lengths})
    jax.block_until_ready(out)
    stamp("extract 5 warm runs", t0)


if __name__ == "__main__":
    main()
