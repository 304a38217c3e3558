"""Compare brute vs cell-grid radius search and full-pipeline throughput."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_single
from d3feat_tpu.data.synthetic import synthetic_fragment
from d3feat_tpu.ops.neighbors import radius_neighbors, radius_neighbors_grid
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

    for m in (16, 32):
        f_grid = lambda p, l, m=m: radius_neighbors_grid(
            p, p, l, l, r0, max_k=40, num_clouds=2, query_tile=2048,
            cell_capacity=m)
        idx, ov = f_grid(points, lengths)
        print(f"grid L0 m={m}: {timeit(f_grid, points, lengths)*1e3:.1f} ms "
              f"overflow={bool(ov)}", flush=True)

    cfg = D3FeatConfig()
    cfg.caps = PyramidCaps(points=(16384, 8192, 2048, 768, 256),
                           neighbors=(40, 40, 40, 40, 40), corr=128)
    cfg.query_tile = 2048
    spec = make_pyramid_spec(cfg)
    f_pyr = lambda p, l: build_pyramid(p, l, spec=spec)
    pyr = f_pyr(points, lengths)
    print(f"pyramid overflow={bool(pyr['overflow'])}", flush=True)
    print(f"pyramid (grid): {timeit(f_pyr, points, lengths)*1e3:.1f} ms", flush=True)

    ts, specs = init_train_state(jax.random.key(0), cfg)
    extract = jax.jit(make_extract_step(cfg, specs))
    batch = {"points": points, "features": feats, "lengths": lengths}
    f_ex = lambda: extract(ts.params, ts.model_state, batch)
    dt = timeit(f_ex)
    print(f"extract (grid): {dt*1e3:.1f} ms = {1/dt:.1f} fragments/s", flush=True)


if __name__ == "__main__":
    main()
