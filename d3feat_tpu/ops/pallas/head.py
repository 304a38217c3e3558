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

Forward-only: the head kernel serves extraction/eval; the training path
keeps the differentiable XLA formulation (models/kpfcnn.detection_scores).
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
    band_ref,            # [CHUNK, 128] f32 scratch
    bx_ref,              # [CHUNK, C] f32 scratch
    sem,                 # DMA semaphores (2,)
):
    T = q_ref.shape[1]
    i = pl.program_id(0)
    start = pl.multiple_of(starts_ref[i], 8)
    n_act = jnp.clip(
        (ends_ref[i] - start + CHUNK - 1) // CHUNK, 0, n_chunk_max)

    sum_ref[:] = jnp.zeros_like(sum_ref)
    cnt_ref[:] = jnp.zeros_like(cnt_ref)

    def chunk_body(cb, carry):
        base = pl.multiple_of(start + cb * CHUNK, 8)
        cp1 = pltpu.make_async_copy(s_hbm.at[pl.ds(base, CHUNK), :],
                                    band_ref, sem.at[0])
        cp2 = pltpu.make_async_copy(x_hbm.at[pl.ds(base, CHUNK), :],
                                    bx_ref, sem.at[1])
        cp1.start(); cp2.start()
        cp1.wait(); cp2.wait()

        selb, _ = _thr_select(band_ref, q_ref, base, CHUNK, T)
        sel = selb.astype(jnp.float32)

        # count selected rows whose feature row is nonzero — the reference
        # counts neighbors with nf_sum != 0 (architectures.py:347-349);
        # shadow rows are exactly zero and are never selected anyway
        row_sum = jnp.sum(bx_ref[:], axis=1, keepdims=True,
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
            sel, bx_ref[:], (((0,), (0,)), ((), ())),
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
            pltpu.VMEM((chunk, 128), jnp.float32),
            pltpu.VMEM((chunk, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
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
