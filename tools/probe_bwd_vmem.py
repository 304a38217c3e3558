"""Bisect bwd_s VMEM: which construct owns the 40 MB?"""
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ, T, C, COUTP, KP, K = 2048, 128, 128, 128, 15, 40
NQ, HS = 16384, 20224
HQ = NQ + BQ

def make_kernel(variant):
    def kern(starts_ref, s_ref, kp_ref, w_ref, scal_ref,
             q_rows_hbm, nb_rows_hbm, gs_hbm, dx_ref,
             qband_ref, nband_ref, gband_ref, sem):
        i = pl.program_id(0)
        start = starts_ref[i]
        cp1 = pltpu.make_async_copy(q_rows_hbm.at[pl.ds(start, BQ), :], qband_ref, sem.at[0])
        cp2 = pltpu.make_async_copy(nb_rows_hbm.at[pl.ds(start, BQ), :], nband_ref, sem.at[1])
        cp3 = pltpu.make_async_copy(gs_hbm.at[pl.ds(start, BQ), :], gband_ref, sem.at[2])
        cp1.start(); cp2.start(); cp3.start()
        cp1.wait(); cp2.wait(); cp3.wait()
        extent = scal_ref[0, 0]
        spos_row = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) + i * T
        if variant in ("full", "nosel_kp", "sel_only"):
            sel = jnp.zeros((BQ, T), jnp.float32)
            for k in range(K):
                sel = sel + (nband_ref[:, k:k+1] == spos_row).astype(jnp.float32)
        elif variant in ("selT", "fullT"):
            # transpose once; sublane slices thereafter (fwd-kernel pattern)
            nbT = nband_ref[:].T                         # [128, BQ]
            spos_col = (jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
                        + i * T)
            selT = jnp.zeros((T, BQ), jnp.float32)
            for k in range(K):
                selT = selT + (nbT[k:k+1, :] == spos_col).astype(jnp.float32)
            if variant == "selT":
                dx_ref[:] = jax.lax.dot_general(
                    selT, gband_ref[:, :C], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return
            qT = qband_ref[:].T                          # [128, BQ]
            extentv = scal_ref[0, 0]
            sx = jax.lax.dot_general(  # placeholder never used
                selT, gband_ref[:, :C], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            rxT = spos_col * 0.0 + 0.0  # not used in this probe variant
            dx_ref[:] = sx
            return
        else:
            sel = (nband_ref[:, 0:1] == spos_row).astype(jnp.float32)
        if variant in ("sel_only", "sel_barrier"):
            dx_ref[:] = jax.lax.dot_general(sel, gband_ref[:, :C],
                                            (((0,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
            return
        rx = s_ref[0:1, :] - qband_ref[:, 0:1]
        ry = s_ref[1:2, :] - qband_ref[:, 1:2]
        rz = s_ref[2:3, :] - qband_ref[:, 2:3]
        def kp_body(kp, acc):
            d = rx - kp_ref[0, 3*kp+0]; d2 = d*d
            d = ry - kp_ref[0, 3*kp+1]; d2 = d2 + d*d
            d = rz - kp_ref[0, 3*kp+2]; d2 = d2 + d*d
            w = jnp.maximum(1.0 - jnp.sqrt(d2) / extent, 0.0) * sel
            dw_band = jax.lax.dot_general(gband_ref[:], w_ref[pl.ds(kp*C, C), :],
                                          (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
            return acc + jax.lax.dot_general(w, dw_band, (((0,), (0,)), ((), ())),
                                             preferred_element_type=jnp.float32)
        dx_ref[:] = jax.lax.fori_loop(0, KP, kp_body, jnp.zeros((T, C), jnp.float32))
    return kern

def run(variant):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(HS // T,),
        in_specs=[
            pl.BlockSpec((8, T), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((T, C), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BQ, 128), jnp.float32),
            pltpu.VMEM((BQ, 128), jnp.int32),
            pltpu.VMEM((BQ, COUTP), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    rng = np.random.default_rng(0)
    args = (
        jnp.zeros((HS // T,), jnp.int32),
        jnp.asarray(rng.normal(size=(8, HS)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, 3 * KP)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(KP * C, COUTP)).astype(np.float32)),
        jnp.full((1, 1), 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(HQ, 128)).astype(np.float32)),
        jnp.asarray(rng.integers(0, HS, size=(HQ, 128)).astype(np.int32)),
        jnp.asarray(rng.normal(size=(HQ, COUTP)).astype(np.float32)),
    )
    try:
        t0 = time.perf_counter()
        out = pl.pallas_call(make_kernel(variant), grid_spec=grid_spec,
                             out_shape=jax.ShapeDtypeStruct((HS, C), jnp.float32))(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = pl.pallas_call(make_kernel(variant), grid_spec=grid_spec,
                                 out_shape=jax.ShapeDtypeStruct((HS, C), jnp.float32))(*args)
        jax.block_until_ready(out)
        print(f"{variant}: OK {(time.perf_counter()-t0)/10*1000:.2f} ms")
    except Exception as e:
        msg = str(e)
        i = msg.find("Scoped allocation")
        print(f"{variant}: FAIL {msg[i:i+60] if i>=0 else msg[:120]}")

for v in ("selT",):
    run(v)
