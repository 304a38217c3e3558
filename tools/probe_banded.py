"""Banded-search TPU timings + end-to-end extract throughput."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_single
from d3feat_tpu.data.synthetic import synthetic_fragment
from d3feat_tpu.ops.neighbors import radius_neighbors, radius_neighbors_banded
from d3feat_tpu.ops.pyramid import build_pyramid, make_pyramid_spec
from d3feat_tpu.train.step import init_train_state, make_extract_step


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    n = 15000
    cap = 16384
    rng = np.random.default_rng(0)
    pts = synthetic_fragment(rng, n, extent=3.0)
    b = pack_single(pts, np.ones((n, 1), np.float32), point_capacity=cap)
    points = jnp.asarray(b["points"])
    feats = jnp.asarray(b["features"])
    lengths = jnp.asarray(b["lengths"])
    r0 = 0.03 * 2.5

    f_brute = lambda p, l: radius_neighbors(
        p, p, l, l, r0, max_k=40, num_clouds=2, query_tile=2048)
    print(f"brute L0: {timeit(f_brute, points, lengths)*1e3:.1f} ms", flush=True)

    for tile, band in ((1024, 2048), (1024, 4096), (2048, 4096), (512, 2048)):
        f = lambda p, l, tile=tile, band=band: radius_neighbors_banded(
            p, p, l, l, r0, max_k=40, num_clouds=2,
            query_tile=tile, band_cap=band)
        idx, ov = f(points, lengths)
        print(f"banded T={tile} band={band}: "
              f"{timeit(f, points, lengths)*1e3:.1f} ms overflow={bool(ov)}",
              flush=True)

    for qt, bf in ((1024, 0.15), (1024, 0.25), (2048, 0.25)):
        cfg = D3FeatConfig()
        cfg.caps = PyramidCaps(points=(16384, 8192, 2048, 768, 256),
                               neighbors=(40, 40, 40, 40, 40), corr=128)
        cfg.query_tile = qt
        cfg.band_frac = bf
        spec = make_pyramid_spec(cfg)
        f_pyr = lambda p, l, spec=spec: build_pyramid(p, l, spec=spec)
        pyr = f_pyr(points, lengths)
        print(f"pyramid qt={qt} bf={bf}: {timeit(f_pyr, points, lengths)*1e3:.1f} ms "
              f"overflow={bool(pyr['overflow'])} bands={spec.band_caps}", flush=True)

    cfg = D3FeatConfig()
    cfg.caps = PyramidCaps(points=(16384, 8192, 2048, 768, 256),
                           neighbors=(40, 40, 40, 40, 40), corr=128)
    cfg.query_tile = 1024
    cfg.band_frac = 0.25
    ts, specs = init_train_state(jax.random.key(0), cfg)
    extract = jax.jit(make_extract_step(cfg, specs))
    batch = {"points": points, "features": feats, "lengths": lengths}
    f_ex = lambda: extract(ts.params, ts.model_state, batch)
    dt = timeit(f_ex)
    print(f"extract (banded): {dt*1e3:.1f} ms = {1/dt:.1f} fragments/s", flush=True)


if __name__ == "__main__":
    main()
