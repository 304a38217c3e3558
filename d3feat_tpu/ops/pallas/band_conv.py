"""Pallas TPU kernel: KPConv over sorted support bands — gathers become MXU
matmuls.

The XLA KPConv gathers [Q, nn, C] neighbor features (random access, VPU
bound). With supports sorted along the banding axis (ops.neighbors
SortedLevel), every query tile's neighbors live in one contiguous support
band, so the convolution can be computed densely over the band:

  for each kernel point kp:
      w_kp[q, n] = influence(|p_n - p_q - kp|) * selected[q, n]   [T, BAND]
      y[q] += (w_kp @ band_x)[q] @ W[kp]                          MXU

``selected`` reproduces the reference's neighbor-cap truncation exactly: a
band point participates iff its ORIGINAL index appears in the query's
[K]-wide neighbor list (the pyramid's calibrated, distance-sorted list) —
K equality compares against the band's index row, no gathers anywhere.

Density normalization (reference models/blocks.py:377-380): divide by the
number of selected neighbors with non-zero feature rows (min 1).

Layout (per the Mosaic v5e constraints in ops/pallas/select.py):
  q_packed  [8, Nq_pad]        sublanes x, y, z, cid
  s_packed  [Ns_pad, 128]      lanes 0-2 coords (cid unused here)
  sidx      [Ns_pad, 128] i32  lane 0 = original support index (row-DMA'd)
  x_sorted  [Ns_pad, C]        support features in sorted order
  neighb    [Nq_pad, K] i32    neighbor lists in SORTED-query row order,
                               ORIGINAL support indices, shadow = big
  weights   [KP, C, Cout]
  kp_pts    [KP, 3] in SMEM-compatible form -> passed as [8, KP] f32 VMEM
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _band_conv_kernel(
    starts_ref,          # [n_tiles] i32 scalar prefetch
    q_ref,               # [8, T] f32 (x, y, z, cid)
    neighb_ref,          # [K, T] i32 original support indices (transposed:
                         #   per-k rows are lane vectors, no relayouts)
    kp_ref,              # [1, 3 * KP] f32 SMEM kernel point coords
    w_ref,               # [KP * C, Cout] f32 conv weights (flattened)
    scal_ref,            # [1, 1] f32 SMEM: extent
    s_hbm,               # [Ns_pad, 128] f32 packed coords
    sidx_hbm,            # [Ns_pad, 128] i32 original indices in lane 0
    x_hbm,               # [Ns_pad, C] f32 sorted features
    out_ref,             # [T, Cout] f32
    band_ref,            # [BAND, 128] f32 scratch
    bidx_ref,            # [BAND, 128] i32 scratch
    bx_ref,              # [BAND, C] f32 scratch
    sem,                 # DMA semaphores (3,)
):
    T = q_ref.shape[1]
    K = neighb_ref.shape[0]
    BAND = band_ref.shape[0]
    KP = kp_ref.shape[1] // 3
    i = pl.program_id(0)
    start = starts_ref[i]

    cp1 = pltpu.make_async_copy(s_hbm.at[pl.ds(start, BAND), :], band_ref,
                                sem.at[0])
    cp2 = pltpu.make_async_copy(sidx_hbm.at[pl.ds(start, BAND), :], bidx_ref,
                                sem.at[1])
    cp3 = pltpu.make_async_copy(x_hbm.at[pl.ds(start, BAND), :], bx_ref,
                                sem.at[2])
    cp1.start(); cp2.start(); cp3.start()
    cp1.wait(); cp2.wait(); cp3.wait()

    extent = scal_ref[0, 0]

    # selected[n, q]: band point's original index appears in query's list
    bidx = bidx_ref[:, 0:1]                      # [BAND, 1] i32
    sel = jnp.zeros((BAND, T), jnp.float32)
    for k in range(K):
        sel = sel + (bidx == neighb_ref[k:k + 1, :]).astype(jnp.float32)
    # each index appears at most once per list -> sel in {0, 1}

    # band feature-row activity for density normalization
    row_sum = jnp.sum(bx_ref[:], axis=1, keepdims=True)      # [BAND, 1]
    # reference counts rows with POSITIVE sums (blocks.py:377-380)
    active = (row_sum > 0.0).astype(jnp.float32)             # [BAND, 1]
    denom = jnp.sum(sel * active, axis=0)                    # [T]
    denom = jnp.maximum(denom, 1.0)

    qx = q_ref[0:1, :]
    qy = q_ref[1:2, :]
    qz = q_ref[2:3, :]
    bx = band_ref[:, 0:1]
    by = band_ref[:, 1:2]
    bz = band_ref[:, 2:3]

    # relative coords [BAND, T] per axis
    rx = bx - qx
    ry = by - qy
    rz = bz - qz

    C = bx_ref.shape[1]
    Cout = out_ref.shape[1]
    acc = jnp.zeros((T, Cout), jnp.float32)
    for kp in range(KP):
        # SMEM scalar reads: width-1 VMEM lane slices are rejected by Mosaic
        dx = rx - kp_ref[0, 3 * kp + 0]
        dy = ry - kp_ref[0, 3 * kp + 1]
        dz = rz - kp_ref[0, 3 * kp + 2]
        d2 = dx * dx + dy * dy + dz * dz
        w = jnp.maximum(1.0 - jnp.sqrt(d2) / extent, 0.0) * sel  # [BAND, T]
        weighted = jax.lax.dot_general(
            w, bx_ref[:],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, C]
        acc = acc + jax.lax.dot_general(
            weighted, w_ref[pl.ds(kp * C, C), :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc / denom[:, None]


@functools.partial(
    jax.jit,
    static_argnames=("band_cap", "query_tile", "interpret"),
)
def band_conv(
    q_packed: jax.Array,     # [8, Nq_pad]
    neighb_sorted: jax.Array,  # [K, Nq_pad] i32 original indices (transposed)
    s_packed: jax.Array,     # [Ns_pad, 128] f32
    sidx_packed: jax.Array,  # [Ns_pad, 128] i32 (lane 0 = original index)
    x_sorted: jax.Array,     # [Ns_pad, C] f32
    weights: jax.Array,      # [KP, C, Cout]
    kernel_points: jax.Array,  # [KP, 3]
    starts: jax.Array,       # [n_tiles] i32
    extent: jax.Array,       # [] f32
    *,
    band_cap: int,
    query_tile: int,
    interpret: bool = False,
) -> jax.Array:
    """[Nq_pad, Cout] KPConv outputs for sorted-order queries (linear
    influence, sum aggregation)."""
    nq = q_packed.shape[1]
    n_tiles = nq // query_tile
    assert n_tiles * query_tile == nq
    kp_count, c, cout = weights.shape
    # pad Cin to a lane multiple (128): narrow feature rows can't be DMA'd
    # and weight-row slices must be tile-aligned
    c_pad = (-c) % 128
    if c_pad:
        weights = jnp.pad(weights, ((0, 0), (0, c_pad), (0, 0)))
        x_sorted = jnp.pad(x_sorted, ((0, 0), (0, c_pad)))
        c = c + c_pad

    kp_flat = kernel_points.astype(jnp.float32).reshape(1, -1)  # [1, 3*KP]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, query_tile), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((neighb_sorted.shape[0], query_tile),
                         lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((query_tile, cout), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((band_cap, 128), jnp.float32),
            pltpu.VMEM((band_cap, 128), jnp.int32),
            pltpu.VMEM((band_cap, c), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        _band_conv_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, cout), jnp.float32),
        interpret=interpret,
    )(
        starts.astype(jnp.int32),
        q_packed.astype(jnp.float32),
        neighb_sorted.astype(jnp.int32),
        kp_flat,
        weights.astype(jnp.float32).reshape(kp_count * c, cout),
        jnp.full((1, 1), extent, jnp.float32),
        s_packed.astype(jnp.float32),
        sidx_packed.astype(jnp.int32),
        x_sorted.astype(jnp.float32),
    )
