import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def t(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"{name}: ok", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:120]}", flush=True)

# A: fori_loop + iota + reductions, VMEM only, no DMA
def kA(x_ref, o_ref):
    col = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
    def body(j, acc):
        m = jnp.min(acc, axis=1, keepdims=True)
        pos = jnp.min(jnp.where(acc == m, col, 128), axis=1)
        o_ref[:, j] = pos
        return jnp.where(col == pos[:, None], 3.0e38, acc)
    jax.lax.fori_loop(0, 8, body, x_ref[:])

x = jax.random.uniform(jax.random.key(0), (256, 128))
t("A fori+argmin-extract (VMEM)", lambda: pl.pallas_call(
    kA, out_shape=jax.ShapeDtypeStruct((256, 8), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))

# B: DMA HBM->VMEM with explicit HBM space
def kB(s_hbm, o_ref, scratch, sem):
    cp = pltpu.make_async_copy(s_hbm.at[pl.ds(0, 256), :], scratch, sem)
    cp.start(); cp.wait()
    o_ref[:] = scratch[:]

s = jax.random.uniform(jax.random.key(1), (1024, 128))
t("B manual DMA (HBM space)", lambda: pl.pallas_call(
    kB, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((256, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA(())])(s))

# C: dynamic start DMA via SMEM scalar
def kC(lo_ref, s_hbm, o_ref, scratch, sem):
    cp = pltpu.make_async_copy(s_hbm.at[pl.ds(lo_ref[0], 256), :], scratch, sem)
    cp.start(); cp.wait()
    o_ref[:] = scratch[:]

t("C dynamic-start DMA", lambda: pl.pallas_call(
    kC, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.HBM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((256, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA(())])(jnp.array([128], jnp.int32), s))

# D: last-dim-3 VMEM block, no DMA
def kD(x_ref, o_ref):
    b = x_ref[:]
    o_ref[:] = jnp.sum(b * b, axis=1, keepdims=True) * jnp.ones((1, 128))

s3 = jax.random.uniform(jax.random.key(2), (256, 3))
t("D last-dim-3 VMEM input", lambda: pl.pallas_call(
    kD, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s3))
