"""Isolate TPU costs: dispatch latency, L0 radius search, top_k variants."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from d3feat_tpu.data.pack import pack_single
from d3feat_tpu.data.synthetic import synthetic_fragment
from d3feat_tpu.ops.neighbors import radius_neighbors


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
    lengths = jnp.asarray(b["lengths"])

    # dispatch latency
    f_triv = jax.jit(lambda x: x + 1.0)
    print(f"dispatch+trivial: {timeit(f_triv, points)*1e3:.2f} ms", flush=True)

    r0 = 0.03 * 2.5
    f_nb = lambda p, l: radius_neighbors(p, p, l, l, r0, max_k=40,
                                         num_clouds=2, query_tile=2048)
    print(f"radius_neighbors L0 (16k, k=40): {timeit(f_nb, points, lengths)*1e3:.1f} ms", flush=True)

    # raw top_k over the same panel shapes
    d2 = jax.random.uniform(jax.random.key(0), (2048, cap))

    @jax.jit
    def full_topk(d2):
        return jax.lax.top_k(-d2, 40)

    print(f"lax.top_k [2048,16384] k=40: {timeit(full_topk, d2)*1e3:.1f} ms  (x8 tiles)", flush=True)

    @jax.jit
    def approx(d2):
        return jax.lax.approx_max_k(-d2, 40, recall_target=0.95)

    print(f"approx_max_k [2048,16384] k=40 r=.95: {timeit(approx, d2)*1e3:.1f} ms", flush=True)

    @jax.jit
    def approx_hi(d2):
        return jax.lax.approx_max_k(-d2, 80, recall_target=0.99)

    print(f"approx_max_k [2048,16384] k=80 r=.99: {timeit(approx_hi, d2)*1e3:.1f} ms", flush=True)

    # argsort-based (what the re-rank uses internally, width 40)
    cand = jax.random.uniform(jax.random.key(1), (2048, 40))

    @jax.jit
    def small_sort(c):
        return jnp.argsort(c, axis=1)

    print(f"argsort [2048,40]: {timeit(small_sort, cand)*1e3:.2f} ms", flush=True)

    # matmul cost for the d2 panel
    sc = jax.random.normal(jax.random.key(2), (cap, 3))

    @jax.jit
    def panel(q, s):
        return q @ s.T

    q = jax.random.normal(jax.random.key(3), (2048, 3))
    print(f"panel matmul [2048,3]x[3,16384]: {timeit(panel, q, sc)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
