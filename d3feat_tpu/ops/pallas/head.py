"""Pallas TPU kernel: detector-head neighborhood statistics over sorted bands.

The D3Feat detector head (reference: models/architectures.py:322-358) needs,
per level-0 point, the SUM of its radius-neighborhood's features and the
COUNT of neighbors with nonzero feature rows (for the neighborhood mean
inside the saliency term). The XLA formulation gathers [C0, K0, D] neighbor
features and reduces twice (~2 ms/fragment at 16k x 40 x 32 — random-access
bound). Over the sorted level-0 band the same statistics are one masked MXU
matmul per band chunk:

  fsum[q] = sel[:, q] @ band_x          (selection^T x features, MXU)
  cnt[q]  = sum_n sel[n, q] * (row n has nonzero sum)

``sel`` reproduces the calibrated K-truncated neighbor list EXACTLY via the
per-query selection thresholds (thr, ptie) from the pyramid's fused select
(see ops/pallas/band_conv._thr_select). The eval-time hard local-max gate
(reference: architectures.py:361-366) keeps its XLA gather + reduce_max:
a max over selected rows cannot ride the MXU, and a per-channel VPU sweep
would cost more than the gather.

``band_head`` is the raw forward; :func:`band_head_ad` wraps it in a
custom VJP so the TRAINING path can ride the same kernel (the reference
trains through this head, architectures.py:322-358): the backward of the
masked sum is the transposed masked matmul dx[r] = sum_t sel[r, t] g[t]
— one more band sweep per step, replacing the XLA [C0, K0, D]
gather-scatter pair. The neighbor count's cotangent is zero (a count of
nonzero rows is piecewise constant, exactly as in the XLA formulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from d3feat_tpu.ops.pallas.band_conv import _pick_chunk, _thr_select


def _band_head_kernel(
    n_chunk_max,         # python int: band_cap // chunk
    CHUNK,               # python int: chunk rows
    starts_ref,          # [n_tiles] i32 scalar prefetch (8-aligned)
    ends_ref,            # [n_tiles] i32 scalar prefetch
    q_ref,               # [8, T] f32 (x, y, z, cid, thr, ptie)
    s_hbm,               # [Ns_pad, 128] f32 packed coords
    x_hbm,               # [Ns_pad, C] f32 features (lane-padded)
    sum_ref,             # [T, C] f32 OUT: neighborhood feature sums
    cnt_ref,             # [8, T] f32 OUT: row 0 = nonzero-row neighbor count
    band_ref,            # [2, CHUNK, 128] f32 scratch (double-buffered)
    bx_ref,              # [2, CHUNK, C] f32 scratch (double-buffered)
    sem,                 # DMA semaphores (4,): 2 slots x (coords, features)
):
    T = q_ref.shape[1]
    i = pl.program_id(0)
    start = pl.multiple_of(starts_ref[i], 8)
    n_act = jnp.clip(
        (ends_ref[i] - start + CHUNK - 1) // CHUNK, 0, n_chunk_max)

    sum_ref[:] = jnp.zeros_like(sum_ref)
    cnt_ref[:] = jnp.zeros_like(cnt_ref)

    # double-buffered band DMA (same rationale as band_conv): overlap
    # chunk cb+1's copies with chunk cb's selection + matmul
    def chunk_dma(slot, cb):
        base = pl.multiple_of(start + cb * CHUNK, 8)
        cp1 = pltpu.make_async_copy(s_hbm.at[pl.ds(base, CHUNK), :],
                                    band_ref.at[slot], sem.at[2 * slot])
        cp2 = pltpu.make_async_copy(x_hbm.at[pl.ds(base, CHUNK), :],
                                    bx_ref.at[slot], sem.at[2 * slot + 1])
        return cp1, cp2

    @pl.when(n_act > 0)
    def _():
        cp1, cp2 = chunk_dma(0, 0)
        cp1.start(); cp2.start()

    def chunk_body(cb, carry):
        slot = jax.lax.rem(cb, 2)
        base = pl.multiple_of(start + cb * CHUNK, 8)

        @pl.when(cb + 1 < n_act)
        def _():
            np1, np2 = chunk_dma(1 - slot, cb + 1)
            np1.start(); np2.start()

        cp1, cp2 = chunk_dma(slot, cb)
        cp1.wait(); cp2.wait()
        band = band_ref.at[slot]
        bx = bx_ref.at[slot]

        selb, _ = _thr_select(band, q_ref, base, CHUNK, T)
        sel = selb.astype(jnp.float32)

        # count selected rows whose feature row is nonzero — the reference
        # counts neighbors with nf_sum != 0 (architectures.py:347-349);
        # shadow rows are exactly zero and are never selected anyway
        row_sum = jnp.sum(bx[:], axis=1, keepdims=True,
                          dtype=jnp.float32)                  # [CHUNK, 1]
        active = (row_sum != 0.0).astype(jnp.float32)
        cnt_ref[0:1, :] = cnt_ref[0:1, :] + jnp.sum(
            sel * active, axis=0, keepdims=True)

        # HIGHEST: the MXU's DEFAULT f32 precision is a single bf16 pass
        # (~3e-3 relative), but these sums feed score means that must match
        # the XLA head (and thus the reference) to fp-accumulation level —
        # top-k keypoint selection keys on tiny score differences. sel is
        # exactly {0,1}; the passes recover full f32 feature precision.
        sum_ref[:] = sum_ref[:] + jax.lax.dot_general(
            sel, bx[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [T, C]
        return carry

    jax.lax.fori_loop(0, n_act, chunk_body, jnp.int32(0))


@functools.partial(
    jax.jit, static_argnames=("band_cap", "query_tile", "interpret")
)
def band_head(
    q_packed: jax.Array,   # [8, Nq_pad] f32: x, y, z, cid, thr, ptie
    s_packed: jax.Array,   # [Ns_pad, 128] f32
    x_sorted: jax.Array,   # [Ns_pad, C] f32 sorted features
    starts: jax.Array,     # [n_tiles] i32
    ends: jax.Array,       # [n_tiles] i32
    *,
    band_cap: int,
    query_tile: int,
    interpret: bool = False,
):
    """(fsum [Nq_pad, C] f32, cnt [Nq_pad] f32): per-query neighborhood
    feature sums and nonzero-row neighbor counts over the threshold-selected
    (exact list membership) sorted band."""
    starts = (starts.astype(jnp.int32) // 8) * 8
    ends = jnp.clip(ends.astype(jnp.int32), starts,
                    starts + jnp.int32(band_cap))
    nq = q_packed.shape[1]
    n_tiles = nq // query_tile
    assert n_tiles * query_tile == nq
    chunk = _pick_chunk(band_cap)
    c = x_sorted.shape[1]
    c_pad = (-c) % 128
    if c_pad:
        x_sorted = jnp.pad(x_sorted, ((0, 0), (0, c_pad)))
        c += c_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, query_tile), lambda i, s, e: (0, i),
                         memory_space=pltpu.VMEM),
            # HBM, not ANY: dynamic band DMA starts (ops/pallas/band_conv)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((query_tile, c), lambda i, s, e: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, query_tile), lambda i, s, e: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 128), jnp.float32),
            pltpu.VMEM((2, chunk, c), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    fsum, cnt = pl.pallas_call(
        functools.partial(_band_head_kernel, band_cap // chunk, chunk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nq, c), jnp.float32),
            jax.ShapeDtypeStruct((8, nq), jnp.float32),
        ],
        interpret=interpret,
    )(
        starts, ends,
        q_packed.astype(jnp.float32),
        s_packed.astype(jnp.float32),
        x_sorted.astype(jnp.float32),
    )
    return fsum, cnt[0]


def _band_head_bwd_kernel(
    n_chunk_max,         # python int: band_cap // chunk
    CHUNK,               # python int: chunk rows
    starts_ref,          # [n_tiles] i32 scalar prefetch (8-aligned)
    ends_ref,            # [n_tiles] i32 scalar prefetch
    q_ref,               # [8, T] f32 (x, y, z, cid, thr, ptie)
    g_ref,               # [T, C] f32: fsum cotangent tile
    s_hbm,               # [Ns_pad, 128] f32 packed coords (HBM)
    dxi_hbm,             # [Ns_pad, C] f32 zero init (HBM, aliased to out)
    dx_out,              # [Ns_pad, C] f32 OUT (aliased zero init, HBM)
    band_ref,            # [2, CHUNK, 128] f32 scratch (double-buffered)
    dxs_ref,             # [2, CHUNK, C] f32 scratch: dx row accumulators
    sem,                 # DMA semaphores (6,): 2x(coords, dx read) + 2 wb
):
    T = q_ref.shape[1]
    i = pl.program_id(0)
    start = pl.multiple_of(starts_ref[i], 8)
    n_act = jnp.clip(
        (ends_ref[i] - start + CHUNK - 1) // CHUNK, 0, n_chunk_max)
    g = g_ref[:]

    # same ordering discipline as band_conv's backward: consecutive chunks
    # of one tile cover DISJOINT dx rows, so only the dxs BUFFER reuse
    # needs per-slot ordering (a slot's previous writeback lands before
    # its buffer is refilled), and the tile's last writeback is drained
    # after the loop (the next tile's band overlaps these rows).
    def chunk_reads(slot, cb):
        base = pl.multiple_of(start + cb * CHUNK, 8)
        cp1 = pltpu.make_async_copy(s_hbm.at[pl.ds(base, CHUNK), :],
                                    band_ref.at[slot], sem.at[2 * slot])
        cp2 = pltpu.make_async_copy(dx_out.at[pl.ds(base, CHUNK), :],
                                    dxs_ref.at[slot], sem.at[2 * slot + 1])
        return cp1, cp2

    def wb_copy(slot, cb):
        base = pl.multiple_of(start + cb * CHUNK, 8)
        return pltpu.make_async_copy(
            dxs_ref.at[slot], dx_out.at[pl.ds(base, CHUNK), :],
            sem.at[4 + slot])

    @pl.when(n_act > 0)
    def _():
        cp1, cp2 = chunk_reads(0, 0)
        cp1.start(); cp2.start()

    def chunk_body(cb, carry):
        slot = jax.lax.rem(cb, 2)

        # slot 1-slot's previous writeback (chunk cb-1) must land before
        # its dxs buffer is refilled by chunk cb+1's dx read
        @pl.when(cb >= 1)
        def _():
            wb_copy(1 - slot, cb - 1).wait()

        @pl.when(cb + 1 < n_act)
        def _():
            np1, np2 = chunk_reads(1 - slot, cb + 1)
            np1.start(); np2.start()

        cp1, cp2 = chunk_reads(slot, cb)
        cp1.wait()
        band = band_ref.at[slot]
        base = pl.multiple_of(start + cb * CHUNK, 8)
        selb, _ = _thr_select(band, q_ref, base, CHUNK, T)
        sel = selb.astype(jnp.float32)
        cp2.wait()
        dxs = dxs_ref.at[slot]
        # dx[r] += sum_t sel[r, t] * g[t]  — the transposed masked sum.
        # HIGHEST for the same reason as the forward: score gradients must
        # match the XLA head's f32 scatter-add to fp-accumulation level.
        dxs[:] = dxs[:] + jax.lax.dot_general(
            sel, g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [CHUNK, C]
        wb_copy(slot, cb).start()  # waited at cb+2 (slot reuse) or below
        return carry

    jax.lax.fori_loop(0, n_act, chunk_body, jnp.int32(0))

    @pl.when(n_act > 0)
    def _():
        wb_copy(jax.lax.rem(n_act - 1, 2), n_act - 1).wait()


def _band_head_bwd_call(q_packed, s_packed, g_pad, dx_init, starts, ends,
                        *, band_cap, query_tile, interpret):
    """dx [Ns_pad, Cpad] f32 from the fsum cotangent ``g_pad``."""
    nq = q_packed.shape[1]
    n_tiles = nq // query_tile
    chunk = _pick_chunk(band_cap)
    c = g_pad.shape[1]
    ns_pad = s_packed.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, query_tile), lambda i, s, e: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, c), lambda i, s, e: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # dx_init
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 128), jnp.float32),
            pltpu.VMEM((2, chunk, c), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_band_head_bwd_kernel, band_cap // chunk, chunk),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ns_pad, c), jnp.float32)],
        # dx_init (input 5 incl. scalar prefetch) donates to the dx output
        input_output_aliases={5: 0},
        interpret=interpret,
    )(
        starts.astype(jnp.int32), ends.astype(jnp.int32),
        q_packed.astype(jnp.float32), g_pad,
        s_packed.astype(jnp.float32), dx_init,
    )[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def band_head_ad(band_cap, query_tile, interpret,
                 q_packed, s_packed, x_sorted, starts, ends):
    """Differentiable :func:`band_head` (same outputs). The cotangent of
    ``cnt`` is discarded: a count of nonzero feature rows is piecewise
    constant in the features, exactly as in the XLA formulation the
    training path previously used (``sum(nf_sum != 0)`` has zero grad)."""
    return band_head(q_packed, s_packed, x_sorted, starts, ends,
                     band_cap=band_cap, query_tile=query_tile,
                     interpret=interpret)


def _band_head_ad_fwd(band_cap, query_tile, interpret,
                      q_packed, s_packed, x_sorted, starts, ends):
    out = band_head(q_packed, s_packed, x_sorted, starts, ends,
                    band_cap=band_cap, query_tile=query_tile,
                    interpret=interpret)
    # x_sorted[:0]: zero-byte carrier of the primal's width + dtype (raw
    # python ints / dtypes are not valid JAX residuals)
    return out, (q_packed, s_packed, starts, ends, x_sorted[:0])


def _band_head_ad_bwd(band_cap, query_tile, interpret, res, g):
    q_packed, s_packed, starts, ends, x_proto = res
    c0, xdt = x_proto.shape[1], x_proto.dtype
    g_fsum, _g_cnt = g  # cnt: zero cotangent (piecewise constant)
    starts = (starts.astype(jnp.int32) // 8) * 8  # same alignment as fwd
    ends = jnp.clip(ends.astype(jnp.int32), starts,
                    starts + jnp.int32(band_cap))
    c = c0 + ((-c0) % 128)
    g_pad = jnp.pad(g_fsum.astype(jnp.float32),
                    ((0, 0), (0, c - g_fsum.shape[1])))[:, :c]
    ns_pad = s_packed.shape[0]
    dx_init = jnp.zeros((ns_pad, c), jnp.float32)
    dx = _band_head_bwd_call(
        q_packed, s_packed, g_pad, dx_init, starts, ends,
        band_cap=band_cap, query_tile=query_tile, interpret=interpret)
    return None, None, dx[:, :c0].astype(xdt), None, None


band_head_ad.defvjp(_band_head_ad_fwd, _band_head_ad_bwd)
