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
band point participates iff its sorted-space POSITION appears in the
query's [K]-wide neighbor list (the pyramid's calibrated, distance-sorted
list) — K equality compares against an iota, no gathers anywhere.

The band is processed in CHUNK-row pieces by a fori_loop whose trip count
is the tile's ACTUAL band occupancy (ceil((end-start)/CHUNK), from the
per-tile ``ends``): kernel cycles scale with the real window, not the
worst-case static cap (real fragments occupy ~30-50% of the density-sized
cap). Rows in [end, chunk boundary) are computed but select nothing (their
positions appear in no list), so ``ends`` only gates WORK, never
correctness — a conservative ``ends = starts + band_cap`` is always valid.

Density normalization (reference models/blocks.py:377-380): divide by the
number of selected neighbors with non-zero feature rows (min 1).

Layout (per the Mosaic v5e constraints in ops/pallas/select.py):
  q_packed  [8, Nq_pad]        sublanes x, y, z, cid
  s_packed  [Ns_pad, 128]      lanes 0-2 coords (cid unused here)
  x_sorted  [Ns_pad, C]        support features in sorted order
  neighb    [K, Nq_pad] i32    neighbor lists in SORTED-query row order,
                               sorted-support POSITIONS, shadow = ns
  weights   [KP, C, Cout]
  kp_pts    [1, 3*KP] f32 in SMEM
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _pick_chunk(band_cap: int) -> int:
    """Largest standard chunk dividing the cap (single chunk otherwise)."""
    for c in (256, 128, 64):
        if band_cap % c == 0:
            return c
    return band_cap


# Mosaic's default scoped-VMEM limit is 16 MB; deep-layer weight panels
# (L4: 15 x 512 x 512 f32 = 15.7 MB) plus scratch need more. v5e has
# 128 MB VMEM/core and the band/chunk buffers are small, so a generous
# limit is safe — it is a guard, not an allocation.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

_BIG = 1.0e10  # masked-out squared distance: sqrt -> 1e5 >> extent, w == 0


def _thr_select(band_ref, q_ref, base, CHUNK, T):
    """Threshold selection: [CHUNK, T] bool membership + the query-space
    squared distances, from (thr, ptie) in q rows 4/5.

    The d2 arithmetic is the EXACT op sequence of the select kernel
    (ops/pallas/select.py), so the compare against thr (the K-th listed
    distance) is bit-exact and membership reproduces the list without any
    [K, T] compare loop: ~14 VPU passes per chunk instead of ~120."""
    qx = q_ref[0:1, :]
    qy = q_ref[1:2, :]
    qz = q_ref[2:3, :]
    qcid = q_ref[3:4, :]
    qthr = q_ref[4:5, :]
    qptie = q_ref[5:6, :]
    d = band_ref[:, 0:1] - qx
    d2q = d * d
    d = band_ref[:, 1:2] - qy
    d2q = d2q + d * d
    d = band_ref[:, 2:3] - qz
    d2q = d2q + d * d
    # Mosaic has no f32 iota: build it i32, convert (base folds in as f32)
    bposf = (jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
             .astype(jnp.float32) + base.astype(jnp.float32))
    sel = ((band_ref[:, 3:4] == qcid)
           & ((d2q < qthr) | ((d2q == qthr) & (bposf <= qptie))))
    return sel, d2q


def _thr_weight(d2m, band_ref, q_ref, kp_ref, kp, inv_extent):
    """Influence weight [CHUNK, T] for kernel point ``kp`` from the masked
    query-space d2: |s - q - k|^2 = |s - q|^2 - 2 s.k + 2 q.k + |k|^2, so
    per kp only two broadcast adds + the sqrt chain run at [CHUNK, T] (the
    dot terms live on the [CHUNK, 1] / [1, T] edges). Masked-out entries
    carry d2 = _BIG -> w = 0 exactly, folding the selection multiply away."""
    kx = kp_ref[0, 3 * kp + 0]
    ky = kp_ref[0, 3 * kp + 1]
    kz = kp_ref[0, 3 * kp + 2]
    a = -2.0 * (band_ref[:, 0:1] * kx + band_ref[:, 1:2] * ky
                + band_ref[:, 2:3] * kz)                       # [CHUNK, 1]
    b = (2.0 * (q_ref[0:1, :] * kx + q_ref[1:2, :] * ky
                + q_ref[2:3, :] * kz)
         + (kx * kx + ky * ky + kz * kz))                      # [1, T]
    d2kp = jnp.maximum(d2m + a + b, 0.0)  # expansion can go ~-1e-7 near kp
    return jnp.maximum(1.0 - jnp.sqrt(d2kp) * inv_extent, 0.0)


def _band_conv_kernel(
    n_chunk_max,         # python int: band_cap // chunk
    CHUNK,               # python int: chunk rows
    use_thr,             # python bool: threshold selection (q rows 4/5)
    starts_ref,          # [n_tiles] i32 scalar prefetch (8-aligned)
    ends_ref,            # [n_tiles] i32 scalar prefetch: band end per tile
    q_ref,               # [8, T] f32 (x, y, z, cid)
    neighb_ref,          # [K, T] i32 sorted-support POSITIONS (transposed:
                         #   per-k rows are lane vectors, no relayouts)
    kp_ref,              # [1, 3 * KP] f32 SMEM kernel point coords
    w_ref,               # [KP * C, Cout] panel-dtype conv weights (flat)
    scal_ref,            # [1, 1] f32 SMEM: extent
    s_hbm,               # [Ns_pad, 128] f32 packed coords
    x_hbm,               # [Ns_pad, C] panel-dtype sorted features
    out_ref,             # [T, Cout] f32
    den_ref,             # [8, T] f32 OUT — row 0 = clamped density denom
                         #   (saved by the custom VJP: the backward scales
                         #   the cotangent by it, no gathers)
    band_ref,            # [2, CHUNK, 128] f32 scratch (double-buffered)
    bx_ref,              # [2, CHUNK, C] panel-dtype scratch (double-buffered)
    acc_ref,             # [T, Cout] f32 scratch accumulator
    sem,                 # DMA semaphores (4,): 2 slots x (coords, features)
):
    # panel dtype (f32 or bf16) is carried by the feature/weight operands;
    # geometry, selection, density and accumulators always stay f32
    pd = bx_ref.dtype
    T = q_ref.shape[1]
    K = neighb_ref.shape[0]
    KP = kp_ref.shape[1] // 3
    i = pl.program_id(0)
    # callers floor starts to multiples of 8 (bf16 HBM tiling demands a
    # provably aligned DMA start; the hint carries the proof to Mosaic)
    start = pl.multiple_of(starts_ref[i], 8)
    n_act = jnp.clip(
        (ends_ref[i] - start + CHUNK - 1) // CHUNK, 0, n_chunk_max)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    den_ref[:] = jnp.zeros_like(den_ref)
    extent = scal_ref[0, 0]
    inv_extent = 1.0 / extent
    qx = q_ref[0:1, :]
    qy = q_ref[1:2, :]
    qz = q_ref[2:3, :]
    C = bx_ref.shape[2]

    # double-buffered band DMA: chunk cb+1's coord/feature copies run
    # while chunk cb's selection + matmuls execute — serialized
    # start();wait() pairs left the per-chunk DMA latency on the critical
    # path (the copies are small, so latency dominates their cost)
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
        # sub-REFS (not value loads): slices stay lazy column reads
        band = band_ref.at[slot]
        bx = bx_ref.at[slot]

        if use_thr:
            selb, d2q = _thr_select(band, q_ref, base, CHUNK, T)
            sel = selb.astype(jnp.float32)
            d2m = jnp.where(selb, d2q, _BIG)
        else:
            # selected[n, q]: chunk row's absolute position appears in the
            # query's list — the sorted-space pyramid contract makes this a
            # pure iota compare (no index DMA)
            bidx = (jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
                    + base)
            sel = jnp.zeros((CHUNK, T), jnp.float32)
            for k in range(K):
                sel = sel + (bidx == neighb_ref[k:k + 1, :]
                             ).astype(jnp.float32)
            # each position appears at most once per list -> sel in {0, 1}

        # feature-row activity for density normalization: the reference
        # counts rows with POSITIVE sums (blocks.py:377-380)
        row_sum = jnp.sum(bx[:], axis=1, keepdims=True,
                          dtype=jnp.float32)                 # [CHUNK, 1]
        active = (row_sum > 0.0).astype(jnp.float32)
        den_ref[0:1, :] = den_ref[0:1, :] + jnp.sum(
            sel * active, axis=0, keepdims=True)

        # UNROLLED python loop over kernel points: a fori_loop here costs
        # ~20% end-to-end serving throughput — Mosaic software-pipelines
        # the straight-line code across MXU and VPU. SMEM scalar reads:
        # width-1 VMEM lane slices are rejected by Mosaic. d2 accumulates
        # one axis at a time; rx/ry/rz are NOT hoisted — folding the query
        # offset into the kernel-point offset ([1, T] lane add) makes the
        # per-kp subtract free either way.
        for kp in range(KP):
            if use_thr:
                w = _thr_weight(d2m, band, q_ref, kp_ref, kp, inv_extent)
            else:
                d = band[:, 0:1] - (qx + kp_ref[0, 3 * kp + 0])
                d2 = d * d
                d = band[:, 1:2] - (qy + kp_ref[0, 3 * kp + 1])
                d2 = d2 + d * d
                d = band[:, 2:3] - (qz + kp_ref[0, 3 * kp + 2])
                d2 = d2 + d * d
                w = jnp.maximum(1.0 - jnp.sqrt(d2) / extent, 0.0) * sel
            weighted = jax.lax.dot_general(
                w.astype(pd), bx[:],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T, C] f32
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                weighted.astype(pd), w_ref[pl.ds(kp * C, C), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return carry

    jax.lax.fori_loop(0, n_act, chunk_body, jnp.int32(0))
    den = jnp.maximum(den_ref[0:1, :].reshape((T,)), 1.0)
    den_ref[0:1, :] = den[None, :]
    out_ref[:] = acc_ref[:] / den[:, None]


def _prep_ends(starts, ends, band_cap, ns):
    """Per-tile band ends: conservative full-cap default, else clipped."""
    if ends is None:
        return starts + jnp.int32(band_cap)
    ends = ends.astype(jnp.int32)
    return jnp.clip(ends, starts, starts + jnp.int32(band_cap))


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
    ends: jax.Array | None = None,  # [n_tiles] i32 actual band ends
    thr: jax.Array | None = None,   # [Nq_pad] f32 K-th listed d2 per query
    ptie: jax.Array | None = None,  # [Nq_pad] f32 tie-break position
    *,
    band_cap: int,
    query_tile: int,
    interpret: bool = False,
    panel_dtype: str = "float32",
):
    """(out [Nq_pad, Cout] f32, den [8, Nq_pad] f32 with row 0 = clamped
    density denom) for sorted-order queries (linear influence, sum
    aggregation). The denom output costs nothing (the kernel computes it
    anyway) and lets the custom VJP scale the cotangent WITHOUT the
    XLA gather-sum that used to cost ~6 ms/layer in the backward.

    ``ends`` bounds each tile's chunk loop to its actual band occupancy
    (pure work gating — see module docstring). ``panel_dtype='bfloat16'``
    runs the MXU panel contractions on bf16 operands with f32 accumulation;
    geometry, selection and density counts stay f32.

    ``(thr, ptie)`` (from ``radius_neighbors_sorted(with_threshold=True)``)
    switch the kernel to THRESHOLD selection: list membership reproduced by
    ``d2 < thr or (d2 == thr and pos <= ptie)`` with the select kernel's
    exact d2 arithmetic — ``neighb_sorted`` is then unused (pass a dummy
    [1, Nq_pad]) and the in-kernel VPU cost drops ~3x."""
    pd = jnp.bfloat16 if panel_dtype == "bfloat16" else jnp.float32
    use_thr = thr is not None
    if use_thr:
        q_packed = (q_packed.astype(jnp.float32)
                    .at[4, :].set(thr.astype(jnp.float32))
                    .at[5, :].set(ptie.astype(jnp.float32)))
        neighb_sorted = neighb_sorted[:1]  # unused in-kernel; shrink the DMA
    # 8-row alignment for the dynamic band DMA (bf16 HBM tiling); matches
    # the select search's flooring so the windows coincide
    starts = (starts.astype(jnp.int32) // 8) * 8
    ends = _prep_ends(starts, ends, band_cap, s_packed.shape[0])
    nq = q_packed.shape[1]
    n_tiles = nq // query_tile
    assert n_tiles * query_tile == nq
    chunk = _pick_chunk(band_cap)
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
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, query_tile), lambda i, s, e: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((neighb_sorted.shape[0], query_tile),
                         lambda i, s, e: (0, i), memory_space=pltpu.VMEM),
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
        out_specs=[
            pl.BlockSpec((query_tile, cout), lambda i, s, e: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, query_tile), lambda i, s, e: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 128), jnp.float32),
            pltpu.VMEM((2, chunk, c), pd),
            pltpu.VMEM((query_tile, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_band_conv_kernel, band_cap // chunk, chunk,
                          use_thr),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nq, cout), jnp.float32),
            jax.ShapeDtypeStruct((8, nq), jnp.float32),
        ],
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(
        starts.astype(jnp.int32),
        ends.astype(jnp.int32),
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
    n_chunk_max,         # python int: band_cap // chunk
    CHUNK,               # python int: chunk rows
    use_thr,             # python bool: threshold selection (q rows 4/5)
    starts_ref,          # [n_tiles] i32 scalar prefetch (8-aligned)
    ends_ref,            # [n_tiles] i32 scalar prefetch
    q_ref,               # [8, T] f32
    neighb_ref,          # [K, T] i32 sorted-support positions
    kp_ref,              # [1, 3 * KP] f32 SMEM
    w_ref,               # [KP * C, Coutp] panel-dtype VMEM
    scal_ref,            # [1, 1] f32 SMEM: extent
    gs_ref,              # [T, Coutp] f32 PRE-SCALED cotangent block
                         #   (g / denom, computed by XLA outside)
    s_hbm, x_hbm,        # coords f32; features in panel dtype
    dx_io,               # [Ns_pad, C] f32 HBM — zero-initialized, aliased
    dw_ref,              # [KP * C, Coutp] f32 OUT — accumulated over tiles
    dx_out,              # alias of dx_io (HBM)
    band_ref, bx_ref, dxs_ref, sem,
):
    """Chunked query-tiled backward:

      dW_kp += weighted_kp(q)^T gs(q)                  (revolving VMEM acc)
      dx[chunk] += w_kp @ (gs @ W_kp^T)                (HBM read-mod-write)

    gs arrives pre-scaled by the density denom (an XLA gather-sum over the
    SAME neighbor lists — one pass instead of a second in-kernel selection
    sweep). The dx accumulation rides the same query tiling and band
    chunks as the forward; the grid is sequential, so the per-chunk
    read-modify-write of dx rows is race-free. Density denom is a COUNT:
    constant under differentiation, exactly like the reference
    (torch.gt-derived, models/blocks.py:377-380).
    """
    pd = bx_ref.dtype
    T = q_ref.shape[1]
    K = neighb_ref.shape[0]
    KP = kp_ref.shape[1] // 3
    i = pl.program_id(0)
    start = pl.multiple_of(starts_ref[i], 8)
    n_act = jnp.clip(
        (ends_ref[i] - start + CHUNK - 1) // CHUNK, 0, n_chunk_max)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    extent = scal_ref[0, 0]
    inv_extent = 1.0 / extent
    qx = q_ref[0:1, :]
    qy = q_ref[1:2, :]
    qz = q_ref[2:3, :]
    C = bx_ref.shape[2]
    gs = gs_ref[:]
    gsb = gs.astype(pd)

    # double-buffered reads (coords, features, dx rows); the dx WRITEBACK
    # stays ordered per slot: a slot's previous writeback is waited before
    # its dxs buffer is refilled, and the tile's last writeback is drained
    # after the loop (the next tile's band overlaps these dx rows).
    # Within a tile consecutive chunks cover DISJOINT dx rows, so chunk
    # cb+1's dx read never races chunk cb's writeback at the HBM level —
    # only the dxs BUFFER reuse needs the per-slot ordering.
    def chunk_reads(slot, cb):
        base = pl.multiple_of(start + cb * CHUNK, 8)
        cp1 = pltpu.make_async_copy(s_hbm.at[pl.ds(base, CHUNK), :],
                                    band_ref.at[slot], sem.at[2 * slot])
        cp2 = pltpu.make_async_copy(x_hbm.at[pl.ds(base, CHUNK), :],
                                    bx_ref.at[slot], sem.at[2 * slot + 1])
        cp3 = pltpu.make_async_copy(dx_out.at[pl.ds(base, CHUNK), :],
                                    dxs_ref.at[slot], sem.at[4 + slot])
        return cp1, cp2, cp3

    def wb_copy(slot, cb):
        base = pl.multiple_of(start + cb * CHUNK, 8)
        return pltpu.make_async_copy(
            dxs_ref.at[slot], dx_out.at[pl.ds(base, CHUNK), :],
            sem.at[6 + slot])

    @pl.when(n_act > 0)
    def _():
        for cp in chunk_reads(0, 0):
            cp.start()

    def chunk_body(cb, carry):
        slot = jax.lax.rem(cb, 2)
        base = pl.multiple_of(start + cb * CHUNK, 8)

        # slot 1-slot's previous writeback (chunk cb-1) must land before
        # its dxs buffer is refilled by chunk cb+1's dx read
        @pl.when(cb >= 1)
        def _():
            wb_copy(1 - slot, cb - 1).wait()

        @pl.when(cb + 1 < n_act)
        def _():
            for cp in chunk_reads(1 - slot, cb + 1):
                cp.start()

        cp1, cp2, cp3 = chunk_reads(slot, cb)
        cp1.wait(); cp2.wait()
        band = band_ref.at[slot]
        bx = bx_ref.at[slot]
        dxs = dxs_ref.at[slot]

        if use_thr:
            selb, d2q = _thr_select(band, q_ref, base, CHUNK, T)
            d2m = jnp.where(selb, d2q, _BIG)
        else:
            bidx = (jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
                    + base)
            sel = jnp.zeros((CHUNK, T), jnp.float32)
            for k in range(K):
                sel = sel + (bidx == neighb_ref[k:k + 1, :]
                             ).astype(jnp.float32)

        cp3.wait()
        for kp in range(KP):
            if use_thr:
                wb = _thr_weight(d2m, band, q_ref, kp_ref, kp,
                                 inv_extent).astype(pd)       # [CHUNK, T]
            else:
                d = band[:, 0:1] - (qx + kp_ref[0, 3 * kp + 0])
                d2 = d * d
                d = band[:, 1:2] - (qy + kp_ref[0, 3 * kp + 1])
                d2 = d2 + d * d
                d = band[:, 2:3] - (qz + kp_ref[0, 3 * kp + 2])
                d2 = d2 + d * d
                wb = (jnp.maximum(1.0 - jnp.sqrt(d2) / extent, 0.0)
                      * sel).astype(pd)                       # [CHUNK, T]
            weighted = jax.lax.dot_general(
                wb, bx[:], (((0,), (0,)), ((), ())),
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
            )  # [T, C] = gs @ W_kp^T
            dxs[:] = dxs[:] + jax.lax.dot_general(
                wb, dwt.astype(pd), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [CHUNK, C]

        wb_copy(slot, cb).start()  # waited at cb+2 (slot reuse) or below
        return carry

    jax.lax.fori_loop(0, n_act, chunk_body, jnp.int32(0))
    # drain the tile's LAST writeback before the body ends: the next
    # tile's overlapping band may read these dx rows. All earlier
    # writebacks were waited inside the loop (one per slot reuse).
    @pl.when(n_act > 0)
    def _():
        wb_copy(jax.lax.rem(n_act - 1, 2), n_act - 1).wait()


def _bwd_call(q_packed, neighb_sorted, s_packed, x_sorted,
              weights_flat, kp_flat, starts, ends, extent, gs_pad, dx_init,
              *, band_cap, query_tile, interpret, use_thr=False):
    """(dW_flat [KP*C, Coutp], dx [Ns_pad, C]).

    x_sorted / weights_flat arrive in the panel dtype (f32 or bf16);
    gs_pad is the denom-scaled cotangent; outputs are f32."""
    nq = q_packed.shape[1]
    n_tiles = nq // query_tile
    kpc, coutp = weights_flat.shape
    c = x_sorted.shape[1]
    pd = x_sorted.dtype
    ns_pad = s_packed.shape[0]
    chunk = _pick_chunk(band_cap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, query_tile), lambda i, s, e: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((neighb_sorted.shape[0], query_tile),
                         lambda i, s, e: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((query_tile, coutp), lambda i, s, e: (i, 0),
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
            pl.BlockSpec((kpc, coutp), lambda i, s, e: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 128), jnp.float32),
            pltpu.VMEM((2, chunk, c), pd),
            pltpu.VMEM((2, chunk, c), jnp.float32),
            # 2 slots x (coords, features) + 2 dx reads + 2 writebacks
            pltpu.SemaphoreType.DMA((8,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_band_conv_bwd_kernel, band_cap // chunk, chunk,
                          use_thr),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((kpc, coutp), jnp.float32),
            jax.ShapeDtypeStruct((ns_pad, c), jnp.float32),
        ],
        # dx_init (input 10 incl. the two scalar-prefetch args) donates its
        # buffer to the dx output (output 1): zero-initialized accumulation
        # target
        input_output_aliases={10: 1},
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(
        starts.astype(jnp.int32), ends.astype(jnp.int32),
        q_packed, neighb_sorted.astype(jnp.int32),
        kp_flat, weights_flat, jnp.full((1, 1), extent, jnp.float32),
        gs_pad, s_packed, x_sorted, dx_init,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def band_conv_ad(band_cap, query_tile, interpret, panel_dtype,
                 q_packed, neighb_sorted, s_packed, x_sorted,
                 weights, kernel_points, starts, extent, ends,
                 thr=None, ptie=None):
    """Differentiable band KPConv. Forward == :func:`band_conv`; backward
    is ONE more chunked query-tiled band kernel producing dW (revolving
    VMEM accumulator) and dx (sequential read-modify-write of the chunk's
    rows in HBM — no scatter, no transposed pass).

    Gradients flow to ``x_sorted`` and ``weights`` only; the density denom
    is a count (constant, as in the reference) and rigid kernel points are
    buffers. Gradient coverage matches the forward's band window — pairs
    dropped by band overflow (flagged upstream) are absent from both.
    ``(thr, ptie)`` switch BOTH kernels to threshold selection (see
    :func:`band_conv`).
    """
    out, _ = band_conv(
        q_packed, neighb_sorted, s_packed, x_sorted, weights,
        kernel_points, starts, extent, ends, thr, ptie,
        band_cap=band_cap, query_tile=query_tile, interpret=interpret,
        panel_dtype=panel_dtype,
    )
    return out


def _band_conv_ad_fwd(band_cap, query_tile, interpret, panel_dtype,
                      q_packed, neighb_sorted, s_packed,
                      x_sorted, weights, kernel_points, starts, extent,
                      ends, thr=None, ptie=None):
    out, den = band_conv(
        q_packed, neighb_sorted, s_packed, x_sorted, weights,
        kernel_points, starts, extent, ends, thr, ptie,
        band_cap=band_cap, query_tile=query_tile, interpret=interpret,
        panel_dtype=panel_dtype,
    )
    res = (q_packed, neighb_sorted, s_packed, x_sorted, weights,
           kernel_points, starts, extent, ends, den, thr, ptie)
    return out, res


def _band_conv_ad_bwd(band_cap, query_tile, interpret, panel_dtype, res, g):
    (q_packed, neighb_sorted, s_packed, x_sorted, weights,
     kernel_points, starts, extent, ends, den, thr, ptie) = res
    use_thr = thr is not None
    if use_thr:
        q_packed = (q_packed.astype(jnp.float32)
                    .at[4, :].set(thr.astype(jnp.float32))
                    .at[5, :].set(ptie.astype(jnp.float32)))
        neighb_sorted = neighb_sorted[:1]
    pd = jnp.bfloat16 if panel_dtype == "bfloat16" else jnp.float32
    starts = (starts.astype(jnp.int32) // 8) * 8  # same alignment as fwd
    ends = _prep_ends(starts, ends, band_cap, s_packed.shape[0])
    kp_count, c0, cout0 = weights.shape
    c = c0 + ((-c0) % 128)
    coutp = cout0 + ((-cout0) % 128)

    # the clamped density denom was computed (for free) by the forward
    # kernel and saved in the residuals — an XLA gather-sum here costs
    # ~6 ms/layer, the scaling is elementwise
    ns_pad = s_packed.shape[0]
    gs = g.astype(jnp.float32) / den[0, :, None]

    w_flat = jnp.pad(
        weights.astype(pd),
        ((0, 0), (0, c - c0), (0, coutp - cout0)),
    ).reshape(kp_count * c, coutp)
    x_p = jnp.pad(x_sorted.astype(pd), ((0, 0), (0, c - c0)))
    gs_p = jnp.pad(gs, ((0, 0), (0, coutp - cout0)))
    kp_flat = kernel_points.astype(jnp.float32).reshape(1, -1)
    dx_init = jnp.zeros((ns_pad, c), jnp.float32)

    dw_flat, dx_full = _bwd_call(
        q_packed.astype(jnp.float32), neighb_sorted,
        s_packed.astype(jnp.float32), x_p, w_flat, kp_flat,
        starts, ends, extent, gs_p, dx_init,
        band_cap=band_cap, query_tile=query_tile, interpret=interpret,
        use_thr=use_thr,
    )
    dweights = dw_flat.reshape(kp_count, c, coutp)[:, :c0, :cout0]
    dweights = dweights.astype(weights.dtype)
    dx = dx_full[:, :c0].astype(x_sorted.dtype)

    return (None, None, None, dx, dweights, None, None, None, None,
            None, None)


band_conv_ad.defvjp(_band_conv_ad_fwd, _band_conv_ad_bwd)
