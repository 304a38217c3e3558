"""Runtime of sorts/scatters/gathers on TPU at pyramid scales."""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def timeit(fn, *args, iters=30):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

key = jax.random.key(0)
for n in (2048, 8192, 16384):
    x = jax.random.uniform(key, (n,))
    xi = jax.random.randint(key, (n,), 0, 1 << 20)
    xu = xi.astype(jnp.uint32)
    print(f"n={n}:", flush=True)
    print(f"  argsort f32: {timeit(jax.jit(jnp.argsort), x)*1e3:.2f} ms", flush=True)
    print(f"  argsort i32: {timeit(jax.jit(jnp.argsort), xi)*1e3:.2f} ms", flush=True)
    f_lex = jax.jit(lambda a, b: jnp.lexsort((a, b)))
    print(f"  lexsort 2xu32: {timeit(f_lex, xu, xu)*1e3:.2f} ms", flush=True)
    order = jnp.argsort(x)
    f_inv = jax.jit(lambda o: jnp.zeros_like(o).at[o].set(jnp.arange(o.shape[0])))
    print(f"  inv-perm scatter: {timeit(f_inv, order)*1e3:.2f} ms", flush=True)
    f_sortkv = jax.jit(lambda k_, v: jax.lax.sort_key_val(k_, v))
    print(f"  sort_key_val: {timeit(f_sortkv, x, order)*1e3:.2f} ms", flush=True)
    g = jax.random.randint(key, (n,), 0, n)
    pts = jax.random.uniform(key, (n, 3))
    f_gather = jax.jit(lambda p, i: p[i])
    print(f"  gather [n,3]: {timeit(f_gather, pts, g)*1e3:.2f} ms", flush=True)
    big = jax.random.uniform(key, (n, 128))
    print(f"  gather [n,128]: {timeit(f_gather, big, g)*1e3:.2f} ms", flush=True)
    f_ss = jax.jit(lambda s, q: jnp.searchsorted(s, q))
    print(f"  searchsorted [n]x[n]: {timeit(f_ss, jnp.sort(x), x)*1e3:.2f} ms", flush=True)
