"""Pallas TPU kernel: fused band distance + k-nearest selection.

The hot op of the on-device pyramid is the radius search. The XLA banded
path materializes a [tile, band] squared-distance panel in HBM and runs
``lax.top_k`` + re-rank over it; this kernel keeps everything in VMEM and
never touches HBM with it:

  per query tile (grid step), per 256-row band CHUNK (fori_loop bounded by
  the tile's ACTUAL band occupancy from the per-tile ``ends``):
    1. DMA the chunk — contiguous rows of the key-sorted, lane-packed
       support array (x, y, z, cloud-id in lanes 0-3 of a 128-wide row),
       start row scalar-prefetched — HBM -> VMEM;
    2. exact elementwise squared distances, TRANSPOSED [CHUNK, T] so band
       coordinates stay on the sublane axis (no in-kernel relayouts;
       matches the reference's nanoflann arithmetic) with cross-cloud /
       out-of-radius entries masked to +inf;
    3. argmin-extraction sweeps (bounded by the chunk's own max candidate
       count): each sweep extracts the chunk minimum per query and
       SHIFT-INSERTS it into a running ascending [K, T] top-K carry —
       static row slices and selects only, never a dynamic store.

  Chunks arrive in ascending position order and sweeps extract equal
  distances in ascending position order; the strict-compare insertion
  preserves that order, so the output is EXACTLY the reference's
  (distance-ascending, ties by position — load-bearing downstream:
  closest_pool reads column 0, reference models/blocks.py:79-91).

Work therefore scales with the tile's actual band occupancy and actual
candidate counts, not the static worst-case cap. Rows past ``ends`` are
out of radius for every query in the tile by the key-window bound, so
``ends`` gates work, never correctness.

Mosaic constraints found empirically on TPU v5e and honored here:
  * dynamic-offset DMA works on the ROW (sublane) axis of >=128-lane
    arrays; lane-axis dynamic DMA and narrow (<128-lane) rows crash the
    compiler — hence the 128-lane packed support layout;
  * dynamic-lane stores (``out_ref[:, j] =``) crash — output rides the
    fori_loop carry and is written once;
  * dynamic band DMA starts must be provably 8-aligned (callers floor
    starts; ``pl.multiple_of`` carries the proof).

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

def _pick_chunk(band_cap: int) -> int:
    """Largest standard chunk dividing the cap (single chunk otherwise)."""
    for c in (256, 128, 64):
        if band_cap % c == 0:
            return c
    return band_cap


CHUNK = 256  # preferred band chunk rows (level_band_cap rounds caps to 256)


def _select_kernel(
    n_chunk_max,           # python int: band_cap // chunk
    CHUNK,                 # python int: chunk rows
    with_dists,            # python bool: also emit the top-K distances
    # scalar prefetch
    starts_ref,            # [n_tiles] int32 band start rows (8-aligned)
    ends_ref,              # [n_tiles] int32 band end rows
    # inputs
    q_ref,                 # [8, T] f32: sublanes x, y, z, cid (VMEM block)
    r2_ref,                # [1, 1] f32 squared radius (SMEM)
    s_hbm,                 # [Ns_pad, 128] f32 packed sorted supports (HBM)
    # outputs
    *refs,                 # out_ref [K, T] i32 (+ dist_ref [K, T] f32),
                           # then scratch: band_ref [CHUNK, 128] f32, sem
):
    if with_dists:
        out_ref, dist_ref, band_ref, sem = refs
    else:
        out_ref, band_ref, sem = refs
        dist_ref = None
    K, T = out_ref.shape
    i = pl.program_id(0)
    start = pl.multiple_of(starts_ref[i], 8)
    n_act = jnp.clip(
        (ends_ref[i] - start + CHUNK - 1) // CHUNK, 0, n_chunk_max)

    qx = q_ref[0:1, :]                 # [1, T]
    qy = q_ref[1:2, :]
    qz = q_ref[2:3, :]
    qcid = q_ref[3:4, :]
    r2 = r2_ref[0, 0]

    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, T), 0)
    empty = jnp.int32(s_hbm.shape[0] - 1)

    # double-buffered band DMA: the copies are small (CHUNK x 512 B), so
    # per-chunk DMA LATENCY — not bandwidth — dominates when serialized
    # with the sweep compute; overlapping chunk cb+1's copy with chunk
    # cb's sweeps hides nearly all of it (measured ~2x on this kernel)
    def chunk_dma(slot, cb):
        base = pl.multiple_of(start + cb * CHUNK, 8)
        return pltpu.make_async_copy(
            s_hbm.at[pl.ds(base, CHUNK), :], band_ref.at[slot],
            sem.at[slot])

    @pl.when(n_act > 0)
    def _():
        chunk_dma(0, 0).start()

    def chunk_body(cb, carry):
        dtop, ptop = carry
        slot = jax.lax.rem(cb, 2)
        base = pl.multiple_of(start + cb * CHUNK, 8)

        @pl.when(cb + 1 < n_act)
        def _():
            chunk_dma(1 - slot, cb + 1).start()

        chunk_dma(slot, cb).wait()
        # sub-REF (not a value load): slices stay lazy column reads
        bnd = band_ref.at[slot]

        # accumulate one axis at a time: three simultaneous [CHUNK, T]
        # diff temporaries would triple the peak VMEM footprint
        d = bnd[:, 0:1] - qx           # [CHUNK, T]
        d2 = d * d
        d = bnd[:, 1:2] - qy
        d2 = d2 + d * d
        d = bnd[:, 2:3] - qz
        d2 = d2 + d * d
        ok = (bnd[:, 3:4] == qcid) & (d2 <= r2)
        d2 = jnp.where(ok, d2, _INF)

        # sweep bound: no query has more candidates in this chunk than the
        # chunk-wide max count; later sweeps would only extract +inf
        k_dyn = jnp.minimum(
            jnp.max(jnp.sum(ok.astype(jnp.int32), axis=0)), jnp.int32(K))

        def sweep(j, c):
            d2c, dtop, ptop = c
            m = jnp.min(d2c, axis=0, keepdims=True)            # [1, T]
            is_min = (d2c == m) & (m < _INF)
            pos = jnp.min(jnp.where(is_min, row, CHUNK), axis=0)  # [T]
            vpos = jnp.where(pos < CHUNK, pos + base, empty)
            d2c = jnp.where(row == pos[None, :], _INF, d2c)

            # shift-insert (m, vpos) into the ascending top-K: v lands at
            # the first row with d > v (strict: equals keep arrival order),
            # rows below it shift down by one — selects + static slices,
            # no dynamic stores
            if K == 1:  # degenerate (upsample searches): plain min
                lt = m < dtop
                new_d = jnp.where(lt, m, dtop)
                new_p = jnp.where(lt, vpos[None, :], ptop)
                return d2c, new_d, new_p
            d_prev = jnp.concatenate(
                [jnp.full((1, T), -_INF, jnp.float32), dtop[: K - 1]],
                axis=0)
            p_prev = jnp.concatenate(
                [jnp.full((1, T), empty, jnp.int32), ptop[: K - 1]],
                axis=0)
            lt = m < dtop                                      # [K, T]
            at = lt & (m >= d_prev)
            new_d = jnp.where(lt, jnp.where(at, m, d_prev), dtop)
            new_p = jnp.where(
                lt, jnp.where(at, vpos[None, :], p_prev), ptop)
            return d2c, new_d, new_p

        _, dtop, ptop = jax.lax.fori_loop(
            0, k_dyn, sweep, (d2, dtop, ptop))
        return dtop, ptop

    dtop, ptop = jax.lax.fori_loop(
        0, n_act, chunk_body,
        (jnp.full((K, T), _INF, jnp.float32),
         jnp.full((K, T), empty, jnp.int32)),
    )
    out_ref[:] = ptop
    if with_dists:
        dist_ref[:] = dtop


@functools.partial(
    jax.jit, static_argnames=("max_k", "band_cap", "query_tile", "interpret",
                              "with_dists")
)
def band_select(
    q_packed: jax.Array,    # [8, Nq_pad] f32: sublanes x, y, z, cid
    s_packed: jax.Array,    # [Ns_pad, 128] f32: lanes 0-3 = x, y, z, cid
    starts: jax.Array,      # [n_tiles] int32 band start row per tile
    r2: jax.Array,          # [] f32
    ends: jax.Array | None = None,  # [n_tiles] int32 actual band ends
    *,
    max_k: int,
    band_cap: int,
    query_tile: int,
    interpret: bool = False,
    with_dists: bool = False,
):
    """[Nq_pad, max_k] int32 global positions into ``s_packed`` rows
    (ascending distance; empty slots = Ns_pad - 1). Rows of padding
    queries (cid < 0) come back all-empty.

    ``with_dists=True`` additionally returns the matching [Nq_pad, max_k]
    f32 squared distances (empty slots = +inf) — the threshold-selection
    source for the fused band convolution (d2 of the K-th neighbor)."""
    nq = q_packed.shape[1]
    n_tiles = nq // query_tile
    assert n_tiles * query_tile == nq
    chunk = _pick_chunk(band_cap)
    starts = (starts.astype(jnp.int32) // 8) * 8
    if ends is None:
        ends = starts + jnp.int32(band_cap)
    else:
        ends = jnp.clip(ends.astype(jnp.int32), starts,
                        starts + jnp.int32(band_cap))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, query_tile), lambda i, s, e: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # explicit HBM: ANY->VMEM promotion of small levels breaks the
            # dynamic-start band DMA (see ops/pallas/band_conv)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((max_k, query_tile), lambda i, s, e: (0, i),
                         memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec((max_k, query_tile), lambda i, s, e: (0, i),
                         memory_space=pltpu.VMEM),
        ] if with_dists else []),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((max_k, nq), jnp.int32)]
    if with_dists:
        out_shape.append(jax.ShapeDtypeStruct((max_k, nq), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_select_kernel, band_cap // chunk, chunk,
                          with_dists),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        starts.astype(jnp.int32),
        ends.astype(jnp.int32),
        q_packed.astype(jnp.float32),
        jnp.full((1, 1), r2, jnp.float32),
        s_packed.astype(jnp.float32),
    )
    if with_dists:
        return out[0].T, out[1].T
    return out[0].T


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
