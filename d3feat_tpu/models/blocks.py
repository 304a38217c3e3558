"""Network blocks: functional init/apply pairs over a static block spec.

Capability counterpart of the reference block zoo
(reference: models/blocks.py:389-731): unary / last_unary blocks, simple
and resnet-bottleneck KPConv blocks (rigid + deformable, strided variants),
nearest-upsample, max-pool and global-average blocks, and the
name -> block registry used by the architecture walker.

Everything is a pure function over explicit parameter pytrees; batch-norm
running statistics (when enabled; the default config replaces BN with a
learned bias, reference config.py:43) live in a separate state pytree so
apply stays functional under jit/shard_map.

Shadow semantics: pooling ops append a zero feature row so all-shadow rows
pool to zero (reference: blocks.py:88,103); padding query rows therefore
produce zeros and are masked downstream by stack lengths.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from d3feat_tpu.models.kpconv import (
    KPConvParams,
    init_kpconv,
    kpconv,
    torch_kaiming_uniform,
)

LEAKY_SLOPE = 0.1  # reference: blocks.py:501 LeakyReLU(0.1)


# ---------------------------------------------------------------------------
# static block description
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BlockSpec:
    """Static description of one network block (hashable, jit-friendly)."""

    name: str         # architecture entry, e.g. 'resnetb_strided'
    kind: str         # 'unary' | 'last_unary' | 'simple' | 'resnetb'
    #                 | 'nearest_upsample' | 'max_pool' | 'global_average'
    layer: int        # pyramid level index
    in_dim: int
    out_dim: int
    radius: float     # conv radius at this level
    strided: bool = False
    deformable: bool = False


def classify_block(name: str) -> str:
    if name == "unary":
        return "unary"
    if name == "last_unary":
        return "last_unary"
    if name.startswith("simple"):
        return "simple"
    if name.startswith("resnetb"):
        return "resnetb"
    if name == "nearest_upsample":
        return "nearest_upsample"
    if name in ("max_pool", "max_pool_wide"):
        return "max_pool"
    if name == "global_average":
        return "global_average"
    raise ValueError(f"unknown block name {name!r}")


# ---------------------------------------------------------------------------
# pooling primitives
# ---------------------------------------------------------------------------


def _ext_zero(x: jax.Array) -> jax.Array:
    return jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)


def closest_pool(x: jax.Array, inds: jax.Array) -> jax.Array:
    """Features of the nearest (first) neighbor; shadow -> zeros
    (reference: blocks.py:79-91 — relies on distance-sorted rows)."""
    return jnp.take(_ext_zero(x), inds[:, 0], axis=0)


def max_pool(x: jax.Array, inds: jax.Array) -> jax.Array:
    """Max over each neighborhood with a zero shadow row
    (reference: blocks.py:94-110)."""
    gathered = jnp.take(_ext_zero(x), inds, axis=0)  # [n2, nn, d]
    return jnp.max(gathered, axis=1)


def global_average(x: jax.Array, lengths: jax.Array, num_clouds: int) -> jax.Array:
    """[B, D] masked per-cloud mean (reference: blocks.py:113-133)."""
    from d3feat_tpu.ops.subsample import lengths_to_cloud_ids

    cid = lengths_to_cloud_ids(lengths, x.shape[0])
    valid = cid < num_clouds
    sums = jax.ops.segment_sum(
        jnp.where(valid[:, None], x, 0.0), jnp.minimum(cid, num_clouds - 1),
        num_segments=num_clouds,
    )
    return sums / jnp.maximum(lengths[:, None].astype(x.dtype), 1.0)


# ---------------------------------------------------------------------------
# batch norm / bias
# ---------------------------------------------------------------------------


def init_norm(dim: int, use_bn: bool):
    """BN scale/offset or a plain learned bias (reference: blocks.py:441-473)."""
    if use_bn:
        params = {"scale": jnp.ones((dim,)), "offset": jnp.zeros((dim,))}
        state = {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))}
    else:
        params = {"bias": jnp.zeros((dim,))}
        state = {}
    return params, state


def apply_norm(params, state, x, mask, *, use_bn, momentum, train):
    """Masked batch normalization (stats over valid rows only) or bias add.

    Returns (y, new_state). ``momentum`` follows the torch convention:
    running <- (1 - momentum) * running + momentum * batch.
    """
    if not use_bn:
        return x + params["bias"], state
    if train:
        w = mask.astype(x.dtype)[:, None]
        n = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(x * w, axis=0) / n
        var = jnp.sum(w * (x - mean) ** 2, axis=0) / n
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * var
            * (n / jnp.maximum(n - 1.0, 1.0)),
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    return y * params["scale"] + params["offset"], new_state


# ---------------------------------------------------------------------------
# linear / unary
# ---------------------------------------------------------------------------


def init_linear(key, in_dim: int, out_dim: int):
    """torch nn.Linear default init (kaiming_uniform a=sqrt(5), uniform bias)."""
    k1, k2 = jax.random.split(key)
    w = torch_kaiming_uniform(k1, (out_dim, in_dim)).T  # stored [in, out]
    bound = 1.0 / math.sqrt(in_dim)
    b = jax.random.uniform(k2, (out_dim,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def apply_linear(params, x, compute_dtype=jnp.float32):
    y = (x.astype(compute_dtype) @ params["w"].astype(compute_dtype))
    return y.astype(jnp.float32) + params["b"]


def init_unary(key, in_dim, out_dim, use_bn):
    params = {"linear": init_linear(key, in_dim, out_dim)}
    norm_p, norm_s = init_norm(out_dim, use_bn)
    params["norm"] = norm_p
    return params, norm_s


def apply_unary(params, state, x, mask, *, use_bn, momentum, train,
                relu=True, compute_dtype=jnp.float32):
    """Linear + (BN | bias) + optional LeakyReLU (reference: blocks.py:481-515)."""
    y = apply_linear(params["linear"], x, compute_dtype)
    y, state = apply_norm(params["norm"], state, y, mask,
                          use_bn=use_bn, momentum=momentum, train=train)
    if relu:
        y = jax.nn.leaky_relu(y, LEAKY_SLOPE)
    return y, state


# ---------------------------------------------------------------------------
# composite blocks
# ---------------------------------------------------------------------------


def init_block(key, spec: BlockSpec, config, kernel_points) -> Tuple[Dict, Dict]:
    """Initialize one block; returns (params, state)."""
    kind = spec.kind
    if kind == "unary":
        return init_unary(key, spec.in_dim, spec.out_dim, config.use_batch_norm)
    if kind == "last_unary":
        return {"linear": init_linear(key, spec.in_dim, config.output_dim)}, {}
    if kind in ("nearest_upsample", "max_pool", "global_average"):
        return {}, {}

    extent = spec.radius * config.KP_extent / config.conv_radius
    if kind == "simple":
        k1, _ = jax.random.split(key)
        conv = init_kpconv(
            k1, config.num_kernel_points, spec.in_dim, spec.out_dim // 2,
            kernel_points, deformable=spec.deformable, modulated=config.modulated,
        )
        norm_p, norm_s = init_norm(spec.out_dim // 2, config.use_batch_norm)
        return {"conv": conv, "norm": norm_p}, {"norm": norm_s}
    if kind == "resnetb":
        keys = jax.random.split(key, 4)
        params: Dict = {}
        state: Dict = {}
        mid = spec.out_dim // 4
        if spec.in_dim != mid:
            params["unary1"], state["unary1"] = init_unary(
                keys[0], spec.in_dim, mid, config.use_batch_norm
            )
        params["conv"] = init_kpconv(
            keys[1], config.num_kernel_points, mid, mid, kernel_points,
            deformable=spec.deformable, modulated=config.modulated,
        )
        params["norm_conv"], state["norm_conv"] = init_norm(mid, config.use_batch_norm)
        params["unary2"], state["unary2"] = init_unary(
            keys[2], mid, spec.out_dim, config.use_batch_norm
        )
        if spec.in_dim != spec.out_dim:
            params["shortcut"], state["shortcut"] = init_unary(
                keys[3], spec.in_dim, spec.out_dim, config.use_batch_norm
            )
        return params, state
    raise ValueError(f"unknown block kind {kind!r}")


def apply_block(params, state, spec: BlockSpec, x, batch, config, *,
                train: bool, compute_dtype=jnp.float32):
    """Apply one block. Returns (features, new_state, aux_or_None)."""
    kind = spec.kind
    use_bn = config.use_batch_norm
    mom = config.batch_norm_momentum
    l = spec.layer

    if kind == "unary":
        mask = batch["masks"][l]
        y, new_state = apply_unary(params, state, x, mask, use_bn=use_bn,
                                   momentum=mom, train=train,
                                   compute_dtype=compute_dtype)
        return y, new_state, None
    if kind == "last_unary":
        return apply_linear(params["linear"], x, compute_dtype), state, None
    if kind == "nearest_upsample":
        # decoder block at level l pools from level l using upsamples[l-1]
        # (reference: blocks.py:712-713)
        return closest_pool(x, batch["upsamples"][l - 1]), state, None
    if kind == "max_pool":
        return max_pool(x, batch["pools"][l + 1]), state, None
    if kind == "global_average":
        return (
            global_average(x, batch["lengths"][-1], len(batch["lengths"][-1])),
            state,
            None,
        )

    if spec.strided:
        q_pts = batch["points"][l + 1]
        s_pts = batch["points"][l]
        inds = batch["pools"][l]
        out_mask = batch["masks"][l + 1]
    else:
        q_pts = batch["points"][l]
        s_pts = batch["points"][l]
        inds = batch["neighbors"][l]
        out_mask = batch["masks"][l]

    extent = spec.radius * config.KP_extent / config.conv_radius
    conv_kw = dict(
        KP_extent=extent,
        KP_influence=config.KP_influence,
        aggregation_mode=config.aggregation_mode,
        deformable=spec.deformable,
        modulated=config.modulated,
        compute_dtype=compute_dtype,
    )

    if kind == "simple":
        if band_conv_eligible(spec, batch, config, train):
            y, aux = apply_band_kpconv(params["conv"], spec, x, batch, config,
                                       compute_dtype=compute_dtype), None
        else:
            y, aux = kpconv(q_pts, s_pts, inds, x, params["conv"], **conv_kw)
        y, norm_s = apply_norm(params["norm"], state["norm"], y, out_mask,
                               use_bn=use_bn, momentum=mom, train=train)
        y = jax.nn.leaky_relu(y, LEAKY_SLOPE)
        return y, {**state, "norm": norm_s}, aux

    if kind == "resnetb":
        new_state = dict(state)
        mid = spec.out_dim // 4
        if "unary1" in params:
            h, new_state["unary1"] = apply_unary(
                params["unary1"], state["unary1"], x, batch["masks"][l],
                use_bn=use_bn, momentum=mom, train=train,
                compute_dtype=compute_dtype,
            )
        else:
            h = x
        if band_conv_eligible(spec, batch, config, train):
            h, aux = apply_band_kpconv(params["conv"], spec, h, batch, config,
                                       compute_dtype=compute_dtype), None
        else:
            h, aux = kpconv(q_pts, s_pts, inds, h, params["conv"], **conv_kw)
        h, new_state["norm_conv"] = apply_norm(
            params["norm_conv"], state["norm_conv"], h, out_mask,
            use_bn=use_bn, momentum=mom, train=train,
        )
        h = jax.nn.leaky_relu(h, LEAKY_SLOPE)
        h, new_state["unary2"] = apply_unary(
            params["unary2"], state["unary2"], h, out_mask,
            use_bn=use_bn, momentum=mom, train=train, relu=False,
            compute_dtype=compute_dtype,
        )
        shortcut = max_pool(x, inds) if spec.strided else x
        if "shortcut" in params:
            shortcut, new_state["shortcut"] = apply_unary(
                params["shortcut"], state["shortcut"], shortcut, out_mask,
                use_bn=use_bn, momentum=mom, train=train, relu=False,
                compute_dtype=compute_dtype,
            )
        return jax.nn.leaky_relu(h + shortcut, LEAKY_SLOPE), new_state, aux

    raise ValueError(f"unknown block kind {kind!r}")


# ---------------------------------------------------------------------------
# fused band KPConv (serving path)
# ---------------------------------------------------------------------------


def band_conv_eligible(spec: BlockSpec, batch, config, train: bool) -> bool:
    """The fused kernel covers the default D3Feat configuration (linear
    influence, sum aggregation, rigid) on forward AND backward: the train
    path runs it through ``band_conv_ad`` (custom VJP with band-tiled
    backward kernels), so both the serving forward and the training
    fwd+bwd hot loop (reference: models/blocks.py:237-387 + trainer.py:103)
    stay on the MXU."""
    if spec.deformable:
        # Deformable KPConv stays on the XLA path PERMANENTLY (recorded
        # round-5 decision). Extending the band kernels would need (a) a
        # per-query kernel-point stream ([CHUNK, KP, 3] of offset
        # positions — today the [KP, 3] dispositions are a broadcast
        # constant), (b) a third backward kernel for the offset gradients,
        # and (c) 2x wider band windows (deform_radius 5.0 vs conv_radius
        # 2.5) that blow the VMEM scoping the band pads are calibrated
        # for. The path is off by default in the reference
        # (reference: config.py:44) and in every released D3Feat config,
        # contributes nothing to the headline benchmarks, and its XLA
        # formulation has exact imported-weight parity incl. modulated
        # (tests/test_reference_parity_deform.py).
        return False
    if config.KP_influence != "linear" or config.aggregation_mode != "sum":
        return False
    # the kernel holds the [KP, Cin_pad128, Cout] weights in VMEM; the
    # kernels raise Mosaic's scoped-VMEM limit to fit deep-layer panels
    # (L4's 15 x 512 x 512 f32 = 15.7 MB), so only configurations beyond
    # ``bandconv_max_panel_mb`` fall back to the XLA gather path
    cin = spec.in_dim if spec.kind == "simple" else spec.out_dim // 4
    cout = spec.out_dim // 2 if spec.kind == "simple" else spec.out_dim // 4
    cin_p = -(-cin // 128) * 128
    panel_mb = config.num_kernel_points * cin_p * cout * 4 / (1024 * 1024)
    if panel_mb > getattr(config, "bandconv_max_panel_mb", 24.0):
        return False
    if spec.layer > getattr(config, "bandconv_max_layer", 99):
        return False
    # a deformable block elsewhere on this level widens the level's search
    # radius by deform_radius/conv_radius; apply_band_kpconv computes its
    # band window from the *unscaled* spec.radius, so a rigid block on such
    # a level would drop in-list neighbors that fall below `starts`
    from d3feat_tpu.ops.pyramid import make_pyramid_spec

    pyr = make_pyramid_spec(config)
    scale = (pyr.pool_r_scale if spec.strided else pyr.conv_r_scale)
    if spec.layer < len(scale) and scale[spec.layer] != 1.0:
        return False
    # a non-empty band dict implies the pyramid's sorted-space contract,
    # which the fused path assumes
    band = batch.get("band") or {}
    q_level = spec.layer + 1 if spec.strided else spec.layer
    return spec.layer in band and q_level in band


def band_query_tiles(qb, sb, num_clouds, r, T, s_rows,
                     thr=None, ptie=None):
    """Shared band-kernel query prep: pad the sorted queries (and their
    selection thresholds) to a tile multiple and compute each tile's
    support band window [start, end) from the sorted keys.

    Returns (q_packed [8, Nq_pad], starts [n_tiles], ends [n_tiles],
    thr, ptie, pad)."""
    from d3feat_tpu.ops.neighbors import SortedLevel

    q_packed = qb["q_packed"]
    qk = qb["key_sorted"]
    nq = q_packed.shape[1]
    pad = (-nq) % T
    if pad:
        q_packed = jnp.pad(q_packed, ((0, 0), (0, pad)))
        q_packed = q_packed.at[3, nq:].set(-1.0)  # padding cid blocks sel
        qk = jnp.pad(qk, (0, pad), constant_values=3.0e37)
        if thr is not None:
            thr = jnp.pad(thr, (0, pad))
            ptie = jnp.pad(ptie, (0, pad), constant_values=-1.0)

    tiles = qk.reshape(-1, T)
    valid = tiles < num_clouds * SortedLevel.KOFF
    kmin = jnp.min(jnp.where(valid, tiles, jnp.float32(3.0e37)), axis=1)
    kmax = jnp.max(jnp.where(valid, tiles, jnp.float32(-1.0)), axis=1)
    # left insertion points via broadcast compare-count over the few tile
    # bounds (searchsorted(method='sort') re-sorts the key array per call)
    starts = jnp.sum(
        sb["key_sorted"][None, :] < (kmin - (r + SortedLevel.EPS))[:, None],
        axis=1,
    ).astype(jnp.int32)
    starts = jnp.minimum(starts, s_rows)
    # actual band end per tile: gates the kernel's chunk loop to the real
    # window (list positions provably lie below it); work-only, see
    # ops/pallas/band_conv
    ends = jnp.sum(
        sb["key_sorted"][None, :] < (kmax + (r + SortedLevel.EPS))[:, None],
        axis=1,
    ).astype(jnp.int32)
    return q_packed, starts, ends, thr, ptie, pad


def apply_band_kpconv(conv_params, spec: BlockSpec, x, batch, config,
                      compute_dtype=jnp.float32):
    """KPConv via the fused band kernel (ops/pallas/band_conv): neighbor
    gathers become dense [tile, band] MXU matmuls over the sorted support
    band. Exactly the reference math incl. the calibrated neighbor-cap
    truncation (selection mask from the pyramid's neighbor lists).
    Differentiable: ``band_conv_ad`` routes grads through band-tiled
    backward kernels (its residual-only inputs are DCE'd on the
    forward-only serving path).

    Requires the pyramid's SORTED-SPACE contract (pyr['sorted_space']):
    features/points/lists already live in key-sorted order with position-
    valued lists, so no per-block reorder gathers exist at all."""
    from d3feat_tpu.ops.pallas.band_conv import band_conv_ad
    from d3feat_tpu.ops.pyramid import level_band_cap

    l = spec.layer
    q_level = l + 1 if spec.strided else l
    qb = batch["band"][q_level]
    sb = batch["band"][l]
    neighb = batch["pools"][l] if spec.strided else batch["neighbors"][l]
    # per-query selection thresholds (exact list membership without the
    # list): present whenever the pyramid ran the fused select — the
    # kernels then skip the [K, T] membership-compare loop entirely
    thr_key = f"pool{l}" if spec.strided else f"conv{l}"
    thr, ptie = batch.get("sel_thr", {}).get(thr_key, (None, None))

    s_rows = batch["points"][l].shape[0]
    n_q_rows = batch["points"][q_level].shape[0]
    band_pad = sb["s_packed"].shape[0] - s_rows
    x_sorted = jnp.concatenate(
        [x, jnp.zeros((band_pad, x.shape[1]), x.dtype)]
    ).astype(jnp.float32)
    neighb_sorted = neighb.T  # [K, Cq] — already sorted rows + positions

    # strided blocks carry the wide pool band: the smaller tile keeps the
    # [band, tile] panels (the kernel's VMEM footprint rides band * tile)
    # bounded — same sizing as the pyramid's pool search
    T = 128 if spec.strided else 256
    num_clouds = len(batch["lengths"][0])
    q_packed, starts, ends, thr, ptie, pad = band_query_tiles(
        qb, sb, num_clouds, spec.radius, T, s_rows, thr, ptie
    )
    if pad:
        neighb_sorted = jnp.pad(
            neighb_sorted, ((0, 0), (0, pad)), constant_values=s_rows
        )

    # density ratio: a strided block's query tile spans ~T * ratio support
    # rows (same sizing as the pyramid's pool search at this level)
    band_cap = level_band_cap(
        s_rows, num_clouds, getattr(config, "band_frac", 0.1), tile=T,
        ratio=-(-s_rows // n_q_rows),
    )
    extent = spec.radius * config.KP_extent / config.conv_radius

    out_sorted = band_conv_ad(
        band_cap, T, jax.default_backend() != "tpu",
        "bfloat16" if compute_dtype == jnp.bfloat16 else "float32",
        q_packed, neighb_sorted, sb["s_packed"], x_sorted,
        conv_params.weights,
        jax.lax.stop_gradient(conv_params.kernel_points),
        starts, jnp.float32(extent), ends, thr, ptie,
    )
    return out_sorted[:n_q_rows]
