"""Which construct makes the banded search compile slowly?"""
import time
import jax, jax.numpy as jnp, numpy as np

def t(name, fn, *args):
    t0=time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {time.perf_counter()-t0:.1f}s", flush=True)

key = jax.random.key(0)
x = jax.random.normal(key, (16384,))
xi = jax.random.randint(key, (16384,), 0, 1<<20)
pts = jax.random.normal(key, (16384, 3))

t("argsort int32 16k", jax.jit(lambda a: jnp.argsort(a)), xi)
t("scatter-inverse perm", jax.jit(lambda o: jnp.zeros_like(o).at[o].set(jnp.arange(o.shape[0], dtype=o.dtype))), jnp.arange(16384, dtype=jnp.int32))
t("searchsorted scalar x32", jax.jit(lambda sk: jnp.stack([jnp.searchsorted(sk, i*100) for i in range(32)])), xi)

def map_ds(sp):
    def one(lo):
        band = jax.lax.dynamic_slice(sp, (lo, 0), (2048, 3))
        d2 = -2.0 * (sp[:512] @ band.T)
        _, idx = jax.lax.top_k(-d2, 40)
        return idx
    return jax.lax.map(one, jnp.arange(32, dtype=jnp.int32) * 100)
t("lax.map dynslice+matmul+topk x32", jax.jit(map_ds), pts)

def map_topk_only(sp):
    def one(q):
        d2 = -2.0 * (q @ sp.T)
        _, idx = jax.lax.top_k(-d2, 40)
        return idx
    return jax.lax.map(one, sp[:16384].reshape(32, 512, 3))
t("lax.map matmul+topk x32 (no dynslice)", jax.jit(map_topk_only), pts)

def map_sortrerank(sp):
    def one(q):
        d2 = -2.0 * (q @ sp[:2048].T)
        _, idx = jax.lax.top_k(-d2, 40)
        cand = jnp.take(sp[:2048], idx, axis=0)
        d2e = jnp.sum((cand - q[:, None, :])**2, -1)
        rank = jnp.argsort(d2e, axis=1)
        return jnp.take_along_axis(idx, rank, axis=1)
    return jax.lax.map(one, sp.reshape(32, 512, 3))
t("lax.map with rerank argsort x32", jax.jit(map_sortrerank), pts)
