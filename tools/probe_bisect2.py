"""Ablate radius_neighbors_banded to find the compile-time explosion."""
import time
import functools
import jax, jax.numpy as jnp, numpy as np

N = 16384
T = 512
BAND = 2048
K = 40

pts = jax.random.normal(jax.random.key(0), (N, 3))
lens = jnp.array([15000, 0], jnp.int32)

def compile_time(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    print(f"{name}: {time.perf_counter()-t0:.1f}s", flush=True)
    return compiled

def variant(sort_inputs=True, inner_search=True, rerank=True, inv_perm=True):
    def fn(points, lengths):
        nq = points.shape[0]
        key = (points[:, 2] / 0.075).astype(jnp.int32)
        if sort_inputs:
            qord = jnp.argsort(key)
            sord = jnp.argsort(key + 1)
            qs = points[qord]; ss = points[sord]
            qk = key[qord]; sk = key[sord]
        else:
            qord = jnp.arange(nq); qs = points; ss = points; qk = key; sk = key
        ss_pad = jnp.concatenate([ss, jnp.full((BAND, 3), 1e6)], 0)

        def one_tile(args):
            tk, qt = args
            if inner_search:
                lo = jnp.searchsorted(sk, tk[0] - 1)
            else:
                lo = jnp.int32(0)
            band = jax.lax.dynamic_slice(ss_pad, (lo, 0), (BAND, 3))
            d2 = (jnp.sum(qt*qt,1)[:,None] - 2.0*(qt @ band.T)
                  + jnp.sum(band*band,1)[None,:])
            _, sel = jax.lax.top_k(-d2, K)
            if rerank:
                cand = jnp.take(band, sel.reshape(-1), axis=0).reshape(T, K, 3)
                d2e = jnp.sum((cand - qt[:,None,:])**2, -1)
                rank = jnp.argsort(d2e, axis=1)
                sel = jnp.take_along_axis(sel, rank, axis=1)
            return sel.astype(jnp.int32)

        out = jax.lax.map(one_tile, (qk.reshape(-1, T), qs.reshape(-1, T, 3)))
        out = out.reshape(-1, K)
        if inv_perm:
            out = out[jnp.argsort(qord)]
        return out
    return fn

compile_time("full-ish", variant(), pts, lens)
compile_time("no input sorts", variant(sort_inputs=False), pts, lens)
compile_time("no inner searchsorted", variant(inner_search=False), pts, lens)
compile_time("no rerank", variant(rerank=False), pts, lens)
compile_time("no inv perm", variant(inv_perm=False), pts, lens)

from d3feat_tpu.ops.neighbors import radius_neighbors_banded
f = functools.partial(radius_neighbors_banded.__wrapped__, max_k=K, num_clouds=2,
                      query_tile=T, band_cap=BAND)
compile_time("actual banded", f, pts, pts, lens, lens, 0.075)
