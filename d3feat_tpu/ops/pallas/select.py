"""Pallas TPU kernel: fused band distance + k-nearest selection.

The hot op of the on-device pyramid is the radius search. The XLA banded
path materializes a [tile, band] squared-distance panel in HBM and runs
``lax.top_k`` + re-rank over it; this kernel keeps the whole panel in VMEM
and never touches HBM with it:

  per query tile (grid step):
    1. DMA the tile's support band — contiguous rows of the key-sorted,
       lane-packed support array (x, y, z, cloud-id in lanes 0-3 of a
       128-wide row), start row scalar-prefetched — HBM -> VMEM;
    2. exact elementwise squared distances, TRANSPOSED [BAND, T] so band
       coordinates stay on the sublane axis (no in-kernel relayouts;
       matches the reference's nanoflann arithmetic) with cross-cloud /
       out-of-radius entries masked to +inf;
    3. k argmin-extraction sweeps entirely in VMEM: each sweep reduces the
       panel over the band axis, emits the winning global band position
       into the [K, T] output (iota-select, never a dynamic store), and
       masks the winner out. Ascending-by-distance order falls out for
       free (load-bearing downstream: closest_pool reads column 0,
       reference models/blocks.py:79-91).

Mosaic constraints found empirically on TPU v5e and honored here:
  * dynamic-offset DMA works on the ROW (sublane) axis of >=128-lane
    arrays; lane-axis dynamic DMA and narrow (<128-lane) rows crash the
    compiler — hence the 128-lane packed support layout;
  * dynamic-lane stores (``out_ref[:, j] =``) crash — output rides the
    fori_loop carry and is written once.

Outputs GLOBAL positions into the sorted support array (empty = Ns_pad-1);
the caller translates positions -> original indices with one vectorized
gather (see ops.neighbors.radius_neighbors_pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.0e38  # python float: jnp scalars would be captured consts


def _select_kernel(
    # scalar prefetch
    starts_ref,            # [n_tiles] int32 band start rows
    # inputs
    q_ref,                 # [8, T] f32: sublanes x, y, z, cid (VMEM block)
    r2_ref,                # [1, 1] f32 squared radius (SMEM)
    s_hbm,                 # [Ns_pad, 128] f32 packed sorted supports (ANY)
    # outputs
    out_ref,               # [K, T] int32 global band positions (VMEM)
    # scratch
    band_ref,              # [BAND, 128] f32
    sem,                   # DMA semaphore
):
    K, T = out_ref.shape
    BAND = band_ref.shape[0]
    i = pl.program_id(0)
    start = starts_ref[i]

    cp = pltpu.make_async_copy(
        s_hbm.at[pl.ds(start, BAND), :], band_ref, sem)
    cp.start()
    cp.wait()

    qx = q_ref[0:1, :]                 # [1, T]
    qy = q_ref[1:2, :]
    qz = q_ref[2:3, :]
    qcid = q_ref[3:4, :]

    bx = band_ref[:, 0:1]              # [BAND, 1]
    by = band_ref[:, 1:2]
    bz = band_ref[:, 2:3]
    bcid = band_ref[:, 3:4]

    # accumulate one axis at a time: three simultaneous [BAND, T] diff
    # temporaries would triple the peak VMEM footprint
    d = bx - qx                        # [BAND, T]
    d2 = d * d
    d = by - qy
    d2 = d2 + d * d
    d = bz - qz
    d2 = d2 + d * d

    ok = (bcid == qcid) & (d2 <= r2_ref[0, 0])
    d2 = jnp.where(ok, d2, _INF)

    row = jax.lax.broadcasted_iota(jnp.int32, (BAND, T), 0)
    krow = jax.lax.broadcasted_iota(jnp.int32, (K, T), 0)
    empty = jnp.int32(s_hbm.shape[0] - 1)

    def sweep(j, carry):
        d2, out = carry
        m = jnp.min(d2, axis=0, keepdims=True)               # [1, T]
        is_min = (d2 == m) & (m < _INF)
        pos = jnp.min(jnp.where(is_min, row, BAND), axis=0)  # [T]
        val = jnp.where(pos < BAND, pos + start, empty)
        out = jnp.where(krow == j, val[None, :], out)
        d2 = jnp.where(row == pos[None, :], _INF, d2)
        return d2, out

    # dynamic sweep bound: no query in this tile has more in-band
    # neighbors than the tile-wide max count, so later sweeps would only
    # emit empties (which the init already provides)
    k_dyn = jnp.minimum(
        jnp.max(jnp.sum(ok.astype(jnp.int32), axis=0)), jnp.int32(K)
    )
    _, out = jax.lax.fori_loop(
        0, k_dyn, sweep, (d2, jnp.full((K, T), empty, jnp.int32))
    )
    out_ref[:] = out


@functools.partial(
    jax.jit, static_argnames=("max_k", "band_cap", "query_tile", "interpret")
)
def band_select(
    q_packed: jax.Array,    # [8, Nq_pad] f32: sublanes x, y, z, cid
    s_packed: jax.Array,    # [Ns_pad, 128] f32: lanes 0-3 = x, y, z, cid
    starts: jax.Array,      # [n_tiles] int32 band start row per tile
    r2: jax.Array,          # [] f32
    *,
    max_k: int,
    band_cap: int,
    query_tile: int,
    interpret: bool = False,
) -> jax.Array:
    """[Nq_pad, max_k] int32 global positions into ``s_packed`` rows
    (ascending distance; empty slots = Ns_pad - 1). Rows of padding
    queries (cid < 0) come back all-empty."""
    nq = q_packed.shape[1]
    n_tiles = nq // query_tile
    assert n_tiles * query_tile == nq

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, query_tile), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((max_k, query_tile), lambda i, s: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((band_cap, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _select_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((max_k, nq), jnp.int32),
        interpret=interpret,
    )(
        starts.astype(jnp.int32),
        q_packed.astype(jnp.float32),
        jnp.full((1, 1), r2, jnp.float32),
        s_packed.astype(jnp.float32),
    )
    return out.T


def pack_supports(points: jax.Array, cid: jax.Array) -> jax.Array:
    """[N, 3] + [N] -> [N, 128] lane-packed rows (x, y, z, cid, 0...)."""
    n = points.shape[0]
    out = jnp.zeros((n, 128), jnp.float32)
    out = out.at[:, 0:3].set(points.astype(jnp.float32))
    out = out.at[:, 3].set(cid.astype(jnp.float32))
    return out


def pack_queries(points: jax.Array, cid: jax.Array) -> jax.Array:
    """[N, 3] + [N] -> [8, N] sublane-packed (x, y, z, cid, 0...)."""
    n = points.shape[0]
    out = jnp.zeros((8, n), jnp.float32)
    out = out.at[0:3, :].set(points.astype(jnp.float32).T)
    out = out.at[3, :].set(cid.astype(jnp.float32))
    return out
