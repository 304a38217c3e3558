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
    neighb_ref,          # [K, T] i32 sorted-support POSITIONS (transposed:
                         #   per-k rows are lane vectors, no relayouts)
    kp_ref,              # [1, 3 * KP] f32 SMEM kernel point coords
    w_ref,               # [KP * C, Cout] f32 conv weights (flattened)
    scal_ref,            # [1, 1] f32 SMEM: extent
    s_hbm,               # [Ns_pad, 128] f32 packed coords
    x_hbm,               # [Ns_pad, C] panel-dtype sorted features
    out_ref,             # [T, Cout] f32
    band_ref,            # [BAND, 128] f32 scratch
    bx_ref,              # [BAND, C] panel-dtype scratch
    sem,                 # DMA semaphores (2,)
):
    # panel dtype (f32 or bf16) is carried by the feature/weight operands;
    # geometry, selection, density and accumulation always stay f32
    pd = bx_ref.dtype
    T = q_ref.shape[1]
    K = neighb_ref.shape[0]
    BAND = band_ref.shape[0]
    KP = kp_ref.shape[1] // 3
    i = pl.program_id(0)
    # callers floor starts to multiples of 8 (bf16 HBM tiling demands a
    # provably aligned DMA start; the hint carries the proof to Mosaic)
    start = pl.multiple_of(starts_ref[i], 8)

    cp1 = pltpu.make_async_copy(s_hbm.at[pl.ds(start, BAND), :], band_ref,
                                sem.at[0])
    cp3 = pltpu.make_async_copy(x_hbm.at[pl.ds(start, BAND), :], bx_ref,
                                sem.at[1])
    cp1.start(); cp3.start()
    cp1.wait(); cp3.wait()

    extent = scal_ref[0, 0]

    # selected[n, q]: band row's sorted-space POSITION appears in the
    # query's list — the sorted-space pyramid contract makes this a pure
    # iota compare (no index DMA)
    bidx = (jax.lax.broadcasted_iota(jnp.int32, (BAND, 1), 0)
            + start)                             # [BAND, 1] i32
    sel = jnp.zeros((BAND, T), jnp.float32)
    for k in range(K):
        sel = sel + (bidx == neighb_ref[k:k + 1, :]).astype(jnp.float32)
    # each position appears at most once per list -> sel in {0, 1}

    # band feature-row activity for density normalization
    row_sum = jnp.sum(bx_ref[:], axis=1, keepdims=True,
                      dtype=jnp.float32)                     # [BAND, 1]
    # reference counts rows with POSITIVE sums (blocks.py:377-380)
    active = (row_sum > 0.0).astype(jnp.float32)             # [BAND, 1]
    denom = jnp.sum(sel * active, axis=0)                    # [T]
    denom = jnp.maximum(denom, 1.0)

    qx = q_ref[0:1, :]
    qy = q_ref[1:2, :]
    qz = q_ref[2:3, :]

    C = bx_ref.shape[1]
    Cout = out_ref.shape[1]

    # UNROLLED python loop over kernel points: a fori_loop here costs ~20%
    # end-to-end serving throughput (30.6 -> 23.9 fragments/s measured) —
    # Mosaic software-pipelines the unrolled straight-line code across MXU
    # and VPU. The price is VMEM: several iterations' [BAND, T] panels stay
    # live at once, so the pallas_call raises vmem_limit_bytes above the
    # 16 MB default (v5e has 128 MB/core). SMEM scalar reads: width-1 VMEM
    # lane slices are rejected by Mosaic. d2 accumulates one axis at a
    # time, and rx/ry/rz are NOT hoisted — folding the query offset into
    # the kernel-point offset ([1, T] lane add) makes the per-kp subtract
    # free either way.
    acc = jnp.zeros((T, Cout), jnp.float32)
    for kp in range(KP):
        d = band_ref[:, 0:1] - (qx + kp_ref[0, 3 * kp + 0])
        d2 = d * d
        d = band_ref[:, 1:2] - (qy + kp_ref[0, 3 * kp + 1])
        d2 = d2 + d * d
        d = band_ref[:, 2:3] - (qz + kp_ref[0, 3 * kp + 2])
        d2 = d2 + d * d
        w = jnp.maximum(1.0 - jnp.sqrt(d2) / extent, 0.0) * sel  # [BAND, T]
        weighted = jax.lax.dot_general(
            w.astype(pd), bx_ref[:],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, C] f32
        acc = acc + jax.lax.dot_general(
            weighted.astype(pd), w_ref[pl.ds(kp * C, C), :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc / denom[:, None]


@functools.partial(
    jax.jit,
    static_argnames=("band_cap", "query_tile", "interpret", "panel_dtype"),
)
def band_conv(
    q_packed: jax.Array,     # [8, Nq_pad]
    neighb_sorted: jax.Array,  # [K, Nq_pad] i32 sorted positions (transposed)
    s_packed: jax.Array,     # [Ns_pad, 128] f32
    x_sorted: jax.Array,     # [Ns_pad, C] f32
    weights: jax.Array,      # [KP, C, Cout]
    kernel_points: jax.Array,  # [KP, 3]
    starts: jax.Array,       # [n_tiles] i32
    extent: jax.Array,       # [] f32
    *,
    band_cap: int,
    query_tile: int,
    interpret: bool = False,
    panel_dtype: str = "float32",
) -> jax.Array:
    """[Nq_pad, Cout] KPConv outputs for sorted-order queries (linear
    influence, sum aggregation).

    ``panel_dtype='bfloat16'`` runs the MXU panel contractions (influence x
    features, weighted x weights) on bf16 operands with f32 accumulation —
    ~4x MXU rate on v5e and half the band feature DMA. Geometry, selection,
    density counts and accumulators stay f32."""
    pd = jnp.bfloat16 if panel_dtype == "bfloat16" else jnp.float32
    # 8-row alignment for the dynamic band DMA (bf16 HBM tiling); matches
    # the select search's flooring so the windows coincide
    starts = (starts.astype(jnp.int32) // 8) * 8
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
            # explicit HBM (not ANY): small levels' bf16 feature arrays fit
            # in VMEM, and Mosaic's ANY->VMEM promotion turns the band DMA
            # into a memref_slice whose dynamic start it cannot prove
            # 8-divisible (compile error)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((query_tile, cout), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((band_cap, 128), jnp.float32),
            pltpu.VMEM((band_cap, c), pd),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _band_conv_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, cout), jnp.float32),
        # the unrolled kp loop keeps several [band, tile] panels live: the
        # default 16 MB scoped limit trips at wide (density-sized) bands —
        # e.g. 26.5 MB at a 32k-row training L0 — while v5e has 128 MB of
        # VMEM per core and the in/out blocks needing double-buffer space
        # are tiny
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(
        starts.astype(jnp.int32),
        q_packed.astype(jnp.float32),
        neighb_sorted.astype(jnp.int32),
        kp_flat,
        weights.astype(pd).reshape(kp_count * c, cout),
        jnp.full((1, 1), extent, jnp.float32),
        s_packed.astype(jnp.float32),
        x_sorted.astype(pd),
    )


# ---------------------------------------------------------------------------
# custom VJP: training runs the fused band kernels too
# ---------------------------------------------------------------------------


def _band_conv_bwd_kernel(
    starts_ref,          # [n_tiles] i32 scalar prefetch
    q_ref,               # [8, T] f32
    neighb_ref,          # [K, T] i32 sorted-support positions
    kp_ref,              # [1, 3 * KP] f32 SMEM
    w_ref,               # [KP * C, Coutp] f32 VMEM
    scal_ref,            # [1, 1] f32 SMEM: extent
    g_ref,               # [T, Coutp] f32 cotangent block (sorted-query order)
    s_hbm, x_hbm,        # coords f32; features in panel dtype
    dx_io,               # [Ns_pad, C] f32 ANY — zero-initialized, aliased out
    dw_ref,              # [KP * C, Coutp] f32 OUT — accumulated over tiles
    gs_ref,              # [T, Coutp] f32 OUT — g / denom per query
    dx_out,              # alias of dx_io (ANY)
    band_ref, bx_ref, dxs_ref, sem,
):
    """One query-tiled pass computes ALL backward quantities:

      dW_kp += weighted_kp(q)^T (g/denom)(q)           (revolving VMEM acc)
      gs      = g / denom                               (emitted for debug)
      dx[band] += w_kp @ ((g/denom) @ W_kp^T)           (HBM read-mod-write)

    The dx accumulation rides the SAME query tiling and support band as the
    forward — the grid is sequential, so read-modify-write DMA of the
    band's dx rows is race-free, and a transposed (support-tiled) kernel —
    whose per-k LANE slices of the neighbor rows blew the VMEM scope — is
    unnecessary. Density denom is a COUNT: constant under differentiation,
    exactly like the reference (torch.gt-derived, models/blocks.py:377-380).
    """
    T = q_ref.shape[1]
    K = neighb_ref.shape[0]
    BAND = band_ref.shape[0]
    KP = kp_ref.shape[1] // 3
    pd = bx_ref.dtype    # panel dtype: f32 or bf16 MXU operands
    i = pl.program_id(0)
    start = pl.multiple_of(starts_ref[i], 8)  # see forward's note

    cp1 = pltpu.make_async_copy(s_hbm.at[pl.ds(start, BAND), :], band_ref,
                                sem.at[0])
    cp2 = pltpu.make_async_copy(x_hbm.at[pl.ds(start, BAND), :], bx_ref,
                                sem.at[1])
    # read this band's current dx rows early (overlaps the compute below).
    # NOTE: read through the OUTPUT ref — the zero-initialized input only
    # seeds the buffer via aliasing (in interpret mode input and output
    # copies are distinct; the output is seeded from the aliased input)
    cp3 = pltpu.make_async_copy(dx_out.at[pl.ds(start, BAND), :], dxs_ref,
                                sem.at[2])
    cp1.start(); cp2.start(); cp3.start()

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    cp1.wait(); cp2.wait()
    extent = scal_ref[0, 0]

    bidx = (jax.lax.broadcasted_iota(jnp.int32, (BAND, 1), 0) + start)
    sel = jnp.zeros((BAND, T), jnp.float32)
    for k in range(K):
        sel = sel + (bidx == neighb_ref[k:k + 1, :]).astype(jnp.float32)

    row_sum = jnp.sum(bx_ref[:], axis=1, keepdims=True,
                      dtype=jnp.float32)
    active = (row_sum > 0.0).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(sel * active, axis=0), 1.0)   # [T]

    gs = g_ref[:] / denom[:, None]                            # [T, Coutp]
    gs_ref[:] = gs
    gsb = gs.astype(pd)

    qx = q_ref[0:1, :]
    qy = q_ref[1:2, :]
    qz = q_ref[2:3, :]

    C = bx_ref.shape[1]

    # dx accumulates IN dxs_ref (seeded by cp3 with the band's current HBM
    # rows) — a separate fori carry would cost another [BAND, C] VMEM block
    cp3.wait()

    # fori_loop (not an unrolled python loop): Mosaic keeps every unrolled
    # iteration's [BAND, T] temporaries live simultaneously, blowing the
    # 16 MB VMEM scope; the loop caps the live set at one iteration.
    # Relative coords are NOT hoisted: three persistent [BAND, T] panels
    # (rx/ry/rz) alone exceed the scope at pool-band shapes — recompute
    # each axis from the resident band_ref scratch instead.
    def kp_body(kp, carry):
        d = band_ref[:, 0:1] - (qx + kp_ref[0, 3 * kp + 0])
        d2 = d * d
        d = band_ref[:, 1:2] - (qy + kp_ref[0, 3 * kp + 1])
        d2 = d2 + d * d
        d = band_ref[:, 2:3] - (qz + kp_ref[0, 3 * kp + 2])
        d2 = d2 + d * d
        wb = (jnp.maximum(1.0 - jnp.sqrt(d2) / extent, 0.0)
              * sel).astype(pd)                               # [BAND, T]
        weighted = jax.lax.dot_general(
            wb, bx_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, C] f32
        dwkp = jax.lax.dot_general(
            weighted.astype(pd), gsb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, Coutp]
        dw_ref[pl.ds(kp * C, C), :] = dw_ref[pl.ds(kp * C, C), :] + dwkp
        dwt = jax.lax.dot_general(
            gsb, w_ref[pl.ds(kp * C, C), :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, C] = (g/denom) @ W_kp^T
        dxs_ref[:] = dxs_ref[:] + jax.lax.dot_general(
            wb, dwt.astype(pd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BAND, C]
        return carry

    jax.lax.fori_loop(0, KP, kp_body, jnp.int32(0))

    wb = pltpu.make_async_copy(dxs_ref, dx_out.at[pl.ds(start, BAND), :],
                               sem.at[2])
    wb.start()
    wb.wait()  # the next (sequential) tile may read overlapping rows


def _bwd_call(q_packed, neighb_sorted, s_packed, x_sorted,
              weights_flat, kp_flat, starts, extent, g_pad, dx_init,
              *, band_cap, query_tile, interpret):
    """(dW_flat [KP*C, Coutp], g_scaled [nq, Coutp], dx [Ns_pad, C]).

    x_sorted / weights_flat arrive in the panel dtype (f32 or bf16); all
    outputs are f32."""
    nq = q_packed.shape[1]
    n_tiles = nq // query_tile
    kpc, coutp = weights_flat.shape
    c = x_sorted.shape[1]
    pd = x_sorted.dtype
    ns_pad = s_packed.shape[0]

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
            # explicit HBM (not ANY): see the forward's note — ANY->VMEM
            # promotion breaks the dynamic-start band DMA
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            # constant index map: one VMEM block accumulated across the
            # sequential grid, written back once at the end
            pl.BlockSpec((kpc, coutp), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, coutp), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((band_cap, 128), jnp.float32),
            pltpu.VMEM((band_cap, c), pd),
            pltpu.VMEM((band_cap, c), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        _band_conv_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((kpc, coutp), jnp.float32),
            jax.ShapeDtypeStruct((nq, coutp), jnp.float32),
            jax.ShapeDtypeStruct((ns_pad, c), jnp.float32),
        ],
        # dx_init (input 9 incl. the scalar-prefetch arg) donates its buffer
        # to the dx output (output 2): zero-initialized accumulation target
        input_output_aliases={9: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(
        starts.astype(jnp.int32), q_packed, neighb_sorted.astype(jnp.int32),
        kp_flat, weights_flat, jnp.full((1, 1), extent, jnp.float32),
        g_pad, s_packed, x_sorted, dx_init,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def band_conv_ad(band_cap, query_tile, interpret, panel_dtype,
                 q_packed, neighb_sorted, s_packed, x_sorted,
                 weights, kernel_points, starts, extent):
    """Differentiable band KPConv. Forward == :func:`band_conv`; backward
    is ONE more query-tiled band kernel producing dW (revolving VMEM
    accumulator), g/denom, and dx (sequential read-modify-write of the
    band's rows in HBM — no scatter, no transposed pass).

    Gradients flow to ``x_sorted`` and ``weights`` only; the density denom
    is a count (constant, as in the reference) and rigid kernel points are
    buffers. Gradient coverage matches the forward's band window — pairs
    dropped by band overflow (flagged upstream) are absent from both.
    """
    return band_conv(
        q_packed, neighb_sorted, s_packed, x_sorted, weights,
        kernel_points, starts, extent,
        band_cap=band_cap, query_tile=query_tile, interpret=interpret,
        panel_dtype=panel_dtype,
    )


def _band_conv_ad_fwd(band_cap, query_tile, interpret, panel_dtype,
                      q_packed, neighb_sorted, s_packed,
                      x_sorted, weights, kernel_points, starts, extent):
    out = band_conv_ad(
        band_cap, query_tile, interpret, panel_dtype,
        q_packed, neighb_sorted, s_packed, x_sorted, weights,
        kernel_points, starts, extent,
    )
    res = (q_packed, neighb_sorted, s_packed, x_sorted, weights,
           kernel_points, starts, extent)
    return out, res


def _band_conv_ad_bwd(band_cap, query_tile, interpret, panel_dtype, res, g):
    (q_packed, neighb_sorted, s_packed, x_sorted, weights,
     kernel_points, starts, extent) = res
    pd = jnp.bfloat16 if panel_dtype == "bfloat16" else jnp.float32
    starts = (starts.astype(jnp.int32) // 8) * 8  # same alignment as fwd
    kp_count, c0, cout0 = weights.shape
    c = c0 + ((-c0) % 128)
    coutp = cout0 + ((-cout0) % 128)

    w_flat = jnp.pad(
        weights.astype(pd),
        ((0, 0), (0, c - c0), (0, coutp - cout0)),
    ).reshape(kp_count * c, coutp)
    x_p = jnp.pad(x_sorted.astype(pd), ((0, 0), (0, c - c0)))
    g_p = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, coutp - cout0)))
    kp_flat = kernel_points.astype(jnp.float32).reshape(1, -1)
    dx_init = jnp.zeros((s_packed.shape[0], c), jnp.float32)

    # same query tile as the forward: a halved backward tile (tried for
    # VMEM headroom) costs ~2x band DMA + half-size MXU panels — with the
    # kernels' raised vmem_limit_bytes the full tile fits
    dw_flat, _, dx_full = _bwd_call(
        q_packed.astype(jnp.float32), neighb_sorted,
        s_packed.astype(jnp.float32), x_p, w_flat, kp_flat,
        starts, extent, g_p, dx_init,
        band_cap=band_cap, query_tile=query_tile, interpret=interpret,
    )
    dweights = dw_flat.reshape(kp_count, c, coutp)[:, :c0, :cout0]
    dweights = dweights.astype(weights.dtype)
    dx = dx_full[:, :c0].astype(x_sorted.dtype)

    return (None, None, None, dx, dweights, None, None, None)


band_conv_ad.defvjp(_band_conv_ad_fwd, _band_conv_ad_bwd)
