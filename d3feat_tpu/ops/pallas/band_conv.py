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


def _band_conv_bwd_q_kernel(
    starts_ref,          # [n_tiles] i32 scalar prefetch
    q_ref,               # [8, T] f32
    neighb_ref,          # [K, T] i32
    kp_ref,              # [1, 3 * KP] f32 SMEM
    w_ref,               # [KP * C, Coutp] f32 VMEM
    scal_ref,            # [1, 1] f32 SMEM: extent
    g_ref,               # [T, Coutp] f32 cotangent block (sorted-query order)
    s_hbm, sidx_hbm, x_hbm,
    dw_ref,              # [KP * C, Coutp] f32 OUT — accumulated over tiles
    gs_ref,              # [T, Coutp] f32 OUT — g / denom per query
    band_ref, bidx_ref, bx_ref, sem,
):
    """dW = sum_q weighted_kp(q)^T (g/denom)(q), recomputing the forward's
    influence/selection panels tile by tile (cheaper than saving [KP, Q, C]
    residuals to HBM). Density denom is a neighbor COUNT — constant under
    differentiation, exactly like the reference (torch.gt-derived,
    models/blocks.py:377-380)."""
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

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    cp1.wait(); cp2.wait(); cp3.wait()
    extent = scal_ref[0, 0]

    bidx = bidx_ref[:, 0:1]
    sel = jnp.zeros((BAND, T), jnp.float32)
    for k in range(K):
        sel = sel + (bidx == neighb_ref[k:k + 1, :]).astype(jnp.float32)

    row_sum = jnp.sum(bx_ref[:], axis=1, keepdims=True)
    active = (row_sum > 0.0).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(sel * active, axis=0), 1.0)   # [T]

    gs = g_ref[:] / denom[:, None]                            # [T, Coutp]
    gs_ref[:] = gs

    qx = q_ref[0:1, :]
    qy = q_ref[1:2, :]
    qz = q_ref[2:3, :]
    rx = band_ref[:, 0:1] - qx
    ry = band_ref[:, 1:2] - qy
    rz = band_ref[:, 2:3] - qz

    C = bx_ref.shape[1]
    for kp in range(KP):
        dx_ = rx - kp_ref[0, 3 * kp + 0]
        dy_ = ry - kp_ref[0, 3 * kp + 1]
        dz_ = rz - kp_ref[0, 3 * kp + 2]
        d2 = dx_ * dx_ + dy_ * dy_ + dz_ * dz_
        w = jnp.maximum(1.0 - jnp.sqrt(d2) / extent, 0.0) * sel  # [BAND, T]
        weighted = jax.lax.dot_general(
            w, bx_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, C]
        dwkp = jax.lax.dot_general(
            weighted, gs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, Coutp]
        dw_ref[pl.ds(kp * C, C), :] = dw_ref[pl.ds(kp * C, C), :] + dwkp


def _band_conv_bwd_s_kernel(
    k_count,             # python int: true neighbor-list width (partial-bound)
    starts_ref,          # [n_s_tiles] i32: QUERY band start per support tile
    s_ref,               # [8, T] f32 support tile coords (x, y, z)
    sidx_ref,            # [8, T] i32 row 0 = original support index
    kp_ref,              # [1, 3 * KP] f32 SMEM
    w_ref,               # [KP * C, Coutp] f32 VMEM
    scal_ref,            # [1, 1] f32 SMEM: extent
    q_rows_hbm,          # [Hq, 128] f32 query coords, row layout
    nb_rows_hbm,         # [Hq, 128] i32 query neighbor lists (lanes 0..K-1)
    gs_hbm,              # [Hq, Coutp] f32 g / denom, sorted-query order
    dx_ref,              # [T, C] f32 OUT
    qband_ref, nband_ref, gband_ref, sem,
):
    """dx[s] = sum_kp sum_q influence_kp(q, s) * sel(q, s) * dweighted_kp(q)
    with dweighted_kp(q) = (g/denom)(q) @ W_kp^T. Tiles ride the SUPPORT
    axis and the contributing queries are DMA'd as a contiguous band of the
    key-sorted query arrays — banding is symmetric (|key(q) - key(s)| <= r
    for any selected pair), so the transpose needs no scatter."""
    T = s_ref.shape[1]
    BQ = qband_ref.shape[0]
    KP = kp_ref.shape[1] // 3
    K_LANES = nband_ref.shape[1]
    i = pl.program_id(0)
    start = starts_ref[i]

    cp1 = pltpu.make_async_copy(q_rows_hbm.at[pl.ds(start, BQ), :],
                                qband_ref, sem.at[0])
    cp2 = pltpu.make_async_copy(nb_rows_hbm.at[pl.ds(start, BQ), :],
                                nband_ref, sem.at[1])
    cp3 = pltpu.make_async_copy(gs_hbm.at[pl.ds(start, BQ), :],
                                gband_ref, sem.at[2])
    cp1.start(); cp2.start(); cp3.start()
    cp1.wait(); cp2.wait(); cp3.wait()

    extent = scal_ref[0, 0]
    sidx_row = sidx_ref[0:1, :]                               # [1, T] i32

    sel = jnp.zeros((BQ, T), jnp.float32)
    for k in range(min(K_LANES, k_count)):
        sel = sel + (nband_ref[:, k:k + 1] == sidx_row).astype(jnp.float32)

    sx = s_ref[0:1, :]
    sy = s_ref[1:2, :]
    sz = s_ref[2:3, :]
    rx = sx - qband_ref[:, 0:1]                               # [BQ, T]
    ry = sy - qband_ref[:, 1:2]
    rz = sz - qband_ref[:, 2:3]

    C = dx_ref.shape[1]
    acc = jnp.zeros((T, C), jnp.float32)
    for kp in range(KP):
        dx_ = rx - kp_ref[0, 3 * kp + 0]
        dy_ = ry - kp_ref[0, 3 * kp + 1]
        dz_ = rz - kp_ref[0, 3 * kp + 2]
        d2 = dx_ * dx_ + dy_ * dy_ + dz_ * dz_
        w = jnp.maximum(1.0 - jnp.sqrt(d2) / extent, 0.0) * sel  # [BQ, T]
        dw_band = jax.lax.dot_general(
            gband_ref[:], w_ref[pl.ds(kp * C, C), :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, C]
        acc = acc + jax.lax.dot_general(
            w, dw_band, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, C]
    dx_ref[:] = acc


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


# ---------------------------------------------------------------------------
# custom VJP: training runs the fused band kernels too
# ---------------------------------------------------------------------------


def _bwd_q_call(q_packed, neighb_sorted, s_packed, sidx_packed, x_sorted,
                weights_flat, kp_flat, starts, extent, g_pad,
                *, band_cap, query_tile, interpret):
    """(dW_flat [KP*C, Coutp], g_scaled [nq, Coutp])."""
    nq = q_packed.shape[1]
    n_tiles = nq // query_tile
    kpc, coutp = weights_flat.shape
    c = x_sorted.shape[1]

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
            pl.BlockSpec((query_tile, coutp), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            # constant index map: one VMEM block accumulated across the
            # sequential grid, written back once at the end
            pl.BlockSpec((kpc, coutp), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, coutp), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((band_cap, 128), jnp.float32),
            pltpu.VMEM((band_cap, 128), jnp.int32),
            pltpu.VMEM((band_cap, c), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        _band_conv_bwd_q_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((kpc, coutp), jnp.float32),
            jax.ShapeDtypeStruct((nq, coutp), jnp.float32),
        ],
        interpret=interpret,
    )(
        starts.astype(jnp.int32), q_packed, neighb_sorted.astype(jnp.int32),
        kp_flat, weights_flat, jnp.full((1, 1), extent, jnp.float32),
        g_pad, s_packed, sidx_packed.astype(jnp.int32), x_sorted,
    )


def _bwd_s_call(s_t, sidx_t, weights_flat, kp_flat, extent, q_rows, nb_rows,
                gs_rows, starts_s, k_count,
                *, bq_cap, query_tile, c, interpret):
    """dx_sorted [Hs, C] for the support rows of s_t (tile layout [8, Hs])."""
    hs = s_t.shape[1]
    n_tiles = hs // query_tile
    kpc, coutp = weights_flat.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, query_tile), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, query_tile), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((query_tile, c), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq_cap, 128), jnp.float32),
            pltpu.VMEM((bq_cap, 128), jnp.int32),
            pltpu.VMEM((bq_cap, coutp), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_band_conv_bwd_s_kernel, k_count),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hs, c), jnp.float32),
        interpret=interpret,
    )(
        starts_s.astype(jnp.int32), s_t, sidx_t, kp_flat, weights_flat,
        jnp.full((1, 1), extent, jnp.float32), q_rows, nb_rows, gs_rows,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def band_conv_ad(band_cap, query_tile, bq_cap, interpret,
                 q_packed, neighb_sorted, s_packed, sidx_packed, x_sorted,
                 weights, kernel_points, starts, extent,
                 q_rows, nb_rows, starts_s):
    """Differentiable band KPConv. Forward == :func:`band_conv`; backward
    runs two more band kernels (query-tiled for dW, support-tiled for dx —
    banding is symmetric, so the transposed pass needs no scatter).

    Extra residual-only inputs (dead on the primal path, DCE'd when not
    differentiated):
      q_rows   [n_q + bq_cap, 128] f32 — QUERY coords in key-sorted row
               layout (= the query level's ``s_packed``);
      nb_rows  [n_q + bq_cap, 128] i32 — query neighbor lists, row layout,
               lanes >= K filled with -1;
      starts_s [ceil(Hs / T)] i32 — query-band start row per SUPPORT tile.

    Gradients flow to ``x_sorted`` and ``weights`` only; the density denom
    is a count (constant, as in the reference) and rigid kernel points are
    buffers. Gradient coverage matches the forward's band window — pairs
    dropped by band overflow (flagged upstream) are absent from both.
    """
    return band_conv(
        q_packed, neighb_sorted, s_packed, sidx_packed, x_sorted, weights,
        kernel_points, starts, extent,
        band_cap=band_cap, query_tile=query_tile, interpret=interpret,
    )


def _band_conv_ad_fwd(band_cap, query_tile, bq_cap, interpret,
                      q_packed, neighb_sorted, s_packed, sidx_packed,
                      x_sorted, weights, kernel_points, starts, extent,
                      q_rows, nb_rows, starts_s):
    out = band_conv_ad(
        band_cap, query_tile, bq_cap, interpret,
        q_packed, neighb_sorted, s_packed, sidx_packed, x_sorted, weights,
        kernel_points, starts, extent, q_rows, nb_rows, starts_s,
    )
    res = (q_packed, neighb_sorted, s_packed, sidx_packed, x_sorted, weights,
           kernel_points, starts, extent, q_rows, nb_rows, starts_s)
    return out, res


def _band_conv_ad_bwd(band_cap, query_tile, bq_cap, interpret, res, g):
    (q_packed, neighb_sorted, s_packed, sidx_packed, x_sorted, weights,
     kernel_points, starts, extent, q_rows, nb_rows, starts_s) = res
    kp_count, c0, cout0 = weights.shape
    c = c0 + ((-c0) % 128)
    coutp = cout0 + ((-cout0) % 128)

    w_flat = jnp.pad(
        weights.astype(jnp.float32),
        ((0, 0), (0, c - c0), (0, coutp - cout0)),
    ).reshape(kp_count * c, coutp)
    x_p = jnp.pad(x_sorted.astype(jnp.float32), ((0, 0), (0, c - c0)))
    g_p = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, coutp - cout0)))
    kp_flat = kernel_points.astype(jnp.float32).reshape(1, -1)

    dw_flat, gs = _bwd_q_call(
        q_packed.astype(jnp.float32), neighb_sorted,
        s_packed.astype(jnp.float32), sidx_packed, x_p, w_flat, kp_flat,
        starts, extent, g_p,
        band_cap=band_cap, query_tile=query_tile, interpret=interpret,
    )
    dweights = dw_flat.reshape(kp_count, c, coutp)[:, :c0, :cout0]
    dweights = dweights.astype(weights.dtype)

    # --- dx over support tiles ------------------------------------------
    n_q = q_rows.shape[0] - bq_cap
    gs_rows = jnp.concatenate(
        [gs[:n_q], jnp.zeros((bq_cap, coutp), jnp.float32)]
    )
    hs0 = s_packed.shape[0]
    hs = -(-hs0 // query_tile) * query_tile
    s_t = jnp.zeros((8, hs), jnp.float32).at[0:3, :hs0].set(
        s_packed[:, 0:3].astype(jnp.float32).T
    )
    if hs > hs0:  # tile padding: far coords, unmatchable index
        s_t = s_t.at[0:3, hs0:].set(1.0e6)
    sidx_t = jnp.full((8, hs), -1, jnp.int32).at[0, :hs0].set(
        sidx_packed[:, 0].astype(jnp.int32)
    )

    dx_full = _bwd_s_call(
        s_t, sidx_t, w_flat, kp_flat, extent,
        q_rows.astype(jnp.float32), nb_rows, gs_rows, starts_s,
        int(neighb_sorted.shape[0]),
        bq_cap=bq_cap, query_tile=query_tile, c=c, interpret=interpret,
    )
    dx = dx_full[:hs0, :c0].astype(x_sorted.dtype)

    return (None, None, None, None, dx, dweights, None, None, None,
            None, None, None)


band_conv_ad.defvjp(_band_conv_ad_fwd, _band_conv_ad_bwd)
