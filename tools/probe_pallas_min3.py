import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def t(name, fn):
    try:
        out = fn(); jax.block_until_ready(out)
        print(f"{name}: ok", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:100]}", flush=True)

x = jax.random.uniform(jax.random.key(0), (256, 128))

# A1: carry-based argmin-extract loop (no dynamic store)
def kA1(x_ref, o_ref):
    col = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (256, 8), 1)
    def body(j, carry):
        acc, out = carry
        m = jnp.min(acc, axis=1, keepdims=True)
        pos = jnp.min(jnp.where(acc == m, col, 128), axis=1)
        out = jnp.where(kcol == j, pos[:, None], out)
        return jnp.where(col == pos[:, None], 3.0e38, acc), out
    _, out = jax.lax.fori_loop(0, 8, body, (x_ref[:], jnp.zeros((256, 8), jnp.int32)))
    o_ref[:] = out
t("A1 carry-loop argmin-extract", lambda: pl.pallas_call(
    kA1, out_shape=jax.ShapeDtypeStruct((256, 8), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))

# A2: single argmin-extract, no loop
def kA2(x_ref, o_ref):
    col = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
    acc = x_ref[:]
    m = jnp.min(acc, axis=1, keepdims=True)
    pos = jnp.min(jnp.where(acc == m, col, 128), axis=1)
    o_ref[:] = (jnp.zeros((256, 8), jnp.int32) + pos[:, None])
t("A2 single argmin-extract", lambda: pl.pallas_call(
    kA2, out_shape=jax.ShapeDtypeStruct((256, 8), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))

# A3: reshape transpose [N,1] -> [1,N]
def kA3(x_ref, o_ref):
    colvec = x_ref[:, 0:1]               # [256, 1]
    row = colvec.reshape(1, 256)         # transpose!
    o_ref[:] = jnp.zeros((256, 128)) + row[:, :128]
t("A3 sublane->lane reshape", lambda: pl.pallas_call(
    kA3, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))

# A4: fori_loop with 2D carry only
def kA4(x_ref, o_ref):
    def body(j, acc):
        return acc * 1.01
    o_ref[:] = jax.lax.fori_loop(0, 8, body, x_ref[:])
t("A4 fori 2D carry", lambda: pl.pallas_call(
    kA4, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))

# A5: min + where + iota (no loop, no extract)
def kA5(x_ref, o_ref):
    col = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
    m = jnp.min(x_ref[:], axis=1, keepdims=True)
    pos = jnp.min(jnp.where(x_ref[:] == m, col, 128), axis=1)
    o_ref[:] = jnp.zeros((256, 128), jnp.int32) + pos[:, None]
t("A5 argmin via iota-min", lambda: pl.pallas_call(
    kA5, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))
