"""Measure XLA formulations of the two gather+reduce serving tails.

The eval local-max gate (models/kpfcnn.py) and the strided-resnetb
shortcut max_pool (models/blocks.py) both lower as

    take(f_ext, neighbor, axis=0)  ->  [n, k, C]  ->  max/sum over k

MFU.md shows them at 5.5% / 13.9% of their one-pass bandwidth bounds.
Hypothesis: XLA materializes the [n, k, C] gather intermediate in HBM
(write + re-read), and per-row gather overhead dominates at small C.
Candidate reformulations, all semantics-identical:

  A  one-shot gather + reduce (current)
  B  lax.scan over k: k row-gathers of [n, C] + running reduce
     (keeps only [n, C] live; no [n, k, C] intermediate)
  C  unrolled fori over k in groups of 4 (fewer, fatter scan steps)

Run on the chip:  python tools/probe_gather_formulations.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e6  # us


@partial(jax.jit, static_argnames=())
def gate_a(f_ext, neighbor):
    nf = jnp.take(f_ext, neighbor, axis=0)          # [n, k, C]
    nf_sum = jnp.sum(nf, axis=-1)
    cnt = jnp.maximum(jnp.sum(nf_sum != 0.0, axis=-1, keepdims=True), 1)
    mean = jnp.sum(nf, axis=1) / cnt.astype(f_ext.dtype)
    lmax = jnp.max(nf, axis=1)
    return mean, lmax


@partial(jax.jit, static_argnames=())
def gate_b(f_ext, neighbor):
    n, k = neighbor.shape
    C = f_ext.shape[1]

    def body(carry, idx):
        s, c, m = carry
        rows = jnp.take(f_ext, idx, axis=0)          # [n, C]
        s = s + rows
        c = c + (jnp.sum(rows, axis=-1, keepdims=True) != 0.0)
        m = jnp.maximum(m, rows)
        return (s, c, m), None

    init = (jnp.zeros((n, C), f_ext.dtype),
            jnp.zeros((n, 1), jnp.int32),
            jnp.full((n, C), -jnp.inf, f_ext.dtype))
    (s, c, m), _ = jax.lax.scan(body, init, neighbor.T)
    mean = s / jnp.maximum(c, 1).astype(f_ext.dtype)
    return mean, m


@partial(jax.jit, static_argnames=())
def pool_a(f_ext, neighbor):
    nf = jnp.take(f_ext, neighbor, axis=0)           # [nq, k, C]
    return jnp.max(nf, axis=1)


@partial(jax.jit, static_argnames=())
def pool_b(f_ext, neighbor):
    nq, k = neighbor.shape
    C = f_ext.shape[1]

    def body(m, idx):
        return jnp.maximum(m, jnp.take(f_ext, idx, axis=0)), None

    m, _ = jax.lax.scan(body, jnp.full((nq, C), -jnp.inf, f_ext.dtype),
                        neighbor.T)
    return m


@partial(jax.jit, static_argnames=("g",))
def pool_c(f_ext, neighbor, g=4):
    nq, k = neighbor.shape
    C = f_ext.shape[1]
    idx = neighbor.T.reshape(k // g, g, nq)

    def body(m, ig):
        nf = jnp.take(f_ext, ig, axis=0)             # [g, nq, C]
        return jnp.maximum(m, jnp.max(nf, axis=0)), None

    m, _ = jax.lax.scan(body, jnp.full((nq, C), -jnp.inf, f_ext.dtype), idx)
    return m


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    # ---- gate shapes: n0 ~ 14k points, k0 = 40, D = 32
    n, k, D = 14080, 40, 32
    f = jnp.asarray(rng.normal(size=(n + 1, D)).astype(np.float32))
    f = f.at[-1].set(0.0)
    nb = jnp.asarray(rng.integers(0, n + 1, size=(n, k)).astype(np.int32))
    ta = bench(gate_a, f, nb)
    tb = bench(gate_b, f, nb)
    ma, la = gate_a(f, nb)
    mb, lb = gate_b(f, nb)
    ok = (np.allclose(np.asarray(ma), np.asarray(mb), atol=1e-5)
          and np.array_equal(np.asarray(la), np.asarray(lb)))
    print(f"gate   n={n} k={k} C={D}:  A {ta:8.0f} us   B {tb:8.0f} us   "
          f"parity={ok}")

    # ---- max_pool shapes per strided level (nq, k, C)
    for nq, kk, C in ((7040, 31, 128), (3584, 37, 256), (1024, 40, 512),
                      (384, 41, 1024)):
        ns = nq * 2
        f = jnp.asarray(rng.normal(size=(ns + 1, C)).astype(np.float32))
        nb = jnp.asarray(rng.integers(0, ns + 1, size=(nq, kk))
                         .astype(np.int32))
        ta = bench(pool_a, f, nb)
        tb = bench(pool_b, f, nb)
        g = 4 if kk % 4 == 0 else (kk and 1)
        tc = bench(pool_c, f, nb[:, : (kk // 4) * 4], 4) if kk >= 4 else 0.0
        pa = np.asarray(pool_a(f, nb))
        pb = np.asarray(pool_b(f, nb))
        ok = np.array_equal(pa, pb)
        print(f"pool   nq={nq} k={kk} C={C}:  A {ta:8.0f} us   "
              f"B {tb:8.0f} us   C(g4,k-trunc) {tc:8.0f} us   parity={ok}")


if __name__ == "__main__":
    main()
