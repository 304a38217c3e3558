"""Compile ONLY the bwd band kernel at the training L0 shape; time it."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from d3feat_tpu.ops.pallas.band_conv import _bwd_call

NQ, NS_PAD, BAND, T, C, COUTP, KP, K = 32768, 37120, 3584, 256, 128, 128, 15, 40

q = jnp.zeros((8, NQ), jnp.float32)
nb = jnp.zeros((K, NQ), jnp.int32)
s = jnp.zeros((NS_PAD, 128), jnp.float32)
x = jnp.zeros((NS_PAD, C), jnp.float32)
w = jnp.zeros((KP * C, COUTP), jnp.float32)
kpf = jnp.zeros((1, 3 * KP), jnp.float32)
starts = jnp.zeros((NQ // T,), jnp.int32)
g = jnp.zeros((NQ, COUTP), jnp.float32)
dx0 = jnp.zeros((NS_PAD, C), jnp.float32)

fn = jax.jit(lambda *a: _bwd_call(*a, band_cap=BAND, query_tile=T,
                                  interpret=False))
t0 = time.perf_counter()
out = fn(q, nb, s, x, w, kpf, starts, jnp.float32(0.1), g, dx0)
jax.block_until_ready(out)
print(f"compile+run T={T}: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for _ in range(10):
    out = fn(q, nb, s, x, w, kpf, starts, jnp.float32(0.1), g, dx0)
jax.block_until_ready(out)
print(f"warm: {(time.perf_counter()-t0)/10*1e3:.2f} ms", flush=True)
