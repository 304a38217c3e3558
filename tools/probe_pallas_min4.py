import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def t(name, fn):
    try:
        out = fn(); jax.block_until_ready(out)
        print(f"{name}: ok {np.asarray(out).ravel()[:3]}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:100]}", flush=True)

s = jax.random.uniform(jax.random.key(0), (8, 4096))

# E: lane-dim DMA with dynamic 128-aligned start
def kE(lo_ref, s_hbm, o_ref, scratch, sem):
    start = lo_ref[0] 
    cp = pltpu.make_async_copy(s_hbm.at[:, pl.ds(start, 2048)], scratch, sem)
    cp.start(); cp.wait()
    o_ref[:] = jnp.zeros((256, 128)) + jnp.sum(scratch[:]) * 0.001
t("E lane-dim aligned DMA", lambda: pl.pallas_call(
    kE, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.HBM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((8, 2048), jnp.float32),
                    pltpu.SemaphoreType.DMA(())])(jnp.array([1024], jnp.int32), s))

# E2: unaligned lane start
t("E2 lane-dim unaligned DMA", lambda: pl.pallas_call(
    kE, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.HBM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((8, 2048), jnp.float32),
                    pltpu.SemaphoreType.DMA(())])(jnp.array([1000], jnp.int32), s))

# F: row extraction from [8, BAND] scratch: scratch[0:1, :] -> [1, BAND]
def kF(s_hbm, o_ref, scratch, sem):
    cp = pltpu.make_async_copy(s_hbm.at[:, pl.ds(0, 2048)], scratch, sem)
    cp.start(); cp.wait()
    bx = scratch[0:1, :]     # [1, 2048]
    q = jnp.ones((256, 1))
    d = q - bx               # [256, 2048] broadcast
    o_ref[:] = jnp.sum(d * d, axis=1, keepdims=True) + jnp.zeros((256, 128))
t("F [1,BAND] row broadcast", lambda: pl.pallas_call(
    kF, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((8, 2048), jnp.float32),
                    pltpu.SemaphoreType.DMA(())])(s))
