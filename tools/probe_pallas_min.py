import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k1(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0

x = jnp.ones((256, 128), jnp.float32)
try:
    y = pl.pallas_call(k1, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                       in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                       out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    print("minimal kernel ok:", float(y[0,0]), flush=True)
except Exception as e:
    print("minimal kernel FAILED:", str(e)[:300], flush=True)

# DMA from ANY + scratch + fori_loop + iota + reductions
def k2(s_hbm, o_ref, scratch, sem):
    cp = pltpu.make_async_copy(s_hbm.at[pl.ds(0, 256), :], scratch, sem)
    cp.start(); cp.wait()
    col = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
    def body(j, acc):
        m = jnp.min(acc, axis=1, keepdims=True)
        pos = jnp.min(jnp.where((acc == m), col, 128), axis=1)
        o_ref[:, j] = pos
        return jnp.where(col == pos[:, None], 3.0e38, acc)
    jax.lax.fori_loop(0, 8, body, scratch[:])

s = jax.random.uniform(jax.random.key(0), (1024, 128))
try:
    y = pl.pallas_call(
        k2,
        out_shape=jax.ShapeDtypeStruct((256, 8), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((256, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(s)
    print("dma+loop kernel ok:", np.asarray(y)[:1, :4], flush=True)
except Exception as e:
    print("dma+loop kernel FAILED:", str(e)[:300], flush=True)

# last-dim-3 arrays
def k3(s_hbm, o_ref, scratch, sem):
    cp = pltpu.make_async_copy(s_hbm.at[pl.ds(0, 256), :], scratch, sem)
    cp.start(); cp.wait()
    b = scratch[:]
    o_ref[:] = jnp.sum(b * b, axis=1, keepdims=True) * jnp.ones((1, 128))

s3 = jax.random.uniform(jax.random.key(1), (1024, 3))
try:
    y = pl.pallas_call(
        k3,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((256, 3), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(s3)
    print("lastdim3 kernel ok", flush=True)
except Exception as e:
    print("lastdim3 kernel FAILED:", str(e)[:300], flush=True)
