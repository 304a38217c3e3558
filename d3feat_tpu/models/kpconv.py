"""Kernel Point Convolution as a pure, statically-shaped JAX function.

Functional counterpart of the reference KPConv module
(reference: models/blocks.py:143-387), with the same math:

  1. gather neighbor coordinates (shadow row at +1e6, blocks.py:277) and
     center on the query point;
  2. squared distances to the K kernel points;
  3. influence weights: constant / linear (clamped 1 - d/extent) / gaussian
     (blocks.py:329-345), optional 'closest' one-hot aggregation;
  4. gather neighbor features (zero shadow row, blocks.py:356), apply
     influence weights, contract with the [K, in, out] weight tensor;
  5. density normalization by the count of neighbors whose feature sum is
     positive, min 1 (blocks.py:377-380).

The two matmul stages are fused into a single MXU-friendly contraction:
  weighted[q, k, c] = sum_n w[q, k, n] * x[q, n, c]
  out[q, d]        = sum_{k,c} weighted[q, k, c] * W[k, c, d]
i.e. a [Q, K*nn] x [Q, nn, C] batched matmul followed by a [Q, K*C] @
[K*C, D] dense matmul.

Deformable mode (off by default, reference blocks.py:243-326): a rigid
offset KPConv predicts per-query kernel offsets (+ optional sigmoid
modulations). The reference dynamically prunes neighbors outside any
deformed kernel's extent via topk; on TPU the width stays static and those
neighbors are masked to shadow instead — identical math, static shape.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from d3feat_tpu.ops.subsample import SHADOW_COORD


class KPConvParams(NamedTuple):
    weights: jax.Array                     # [K, in, out]
    kernel_points: jax.Array               # [K, 3] (non-trainable buffer)
    offset_weights: Optional[jax.Array] = None  # [K, in, offset_dim] (deformable)
    offset_kernel_points: Optional[jax.Array] = None
    offset_bias: Optional[jax.Array] = None


def torch_kaiming_uniform(key, shape, dtype=jnp.float32):
    """U(-b, b) with b = sqrt(3) * sqrt(2/(1+5)) / sqrt(fan_in), fan_in
    computed the torch way (dim 1 x trailing dims) — matches the reference's
    parameter statistics for training parity (blocks.py:216-217)."""
    fan_in = shape[1] if len(shape) == 2 else shape[1] * math.prod(shape[2:])
    bound = math.sqrt(3.0) * math.sqrt(2.0 / 6.0) / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_kpconv(
    key,
    num_kpoints: int,
    in_dim: int,
    out_dim: int,
    kernel_points,
    *,
    deformable: bool = False,
    modulated: bool = False,
    p_dim: int = 3,
) -> KPConvParams:
    kernel_points = jnp.asarray(kernel_points, jnp.float32)
    if not deformable:
        return KPConvParams(
            weights=torch_kaiming_uniform(key, (num_kpoints, in_dim, out_dim)),
            kernel_points=kernel_points,
        )
    k1, k2 = jax.random.split(key)
    offset_dim = (p_dim + 1) * num_kpoints if modulated else p_dim * num_kpoints
    return KPConvParams(
        weights=torch_kaiming_uniform(k1, (num_kpoints, in_dim, out_dim)),
        kernel_points=kernel_points,
        offset_weights=torch_kaiming_uniform(k2, (num_kpoints, in_dim, offset_dim)),
        offset_kernel_points=kernel_points,
        offset_bias=jnp.zeros((offset_dim,), jnp.float32),
    )


class KPConvAux(NamedTuple):
    """Deformable-regularizer inputs (reference: architectures.py:22-55)."""

    min_d2: Optional[jax.Array] = None       # [Q, K] min sq dist to inputs
    deformed_kp: Optional[jax.Array] = None  # [Q, K, 3]


def _influence(sq_d, extent: float, mode: str):
    if mode == "constant":
        return jnp.ones_like(sq_d)
    if mode == "linear":
        # guard sqrt(0): its unbounded derivative poisons gradients flowing
        # to deformable offsets / kernel points whenever a neighbor lands
        # exactly on a kernel point (always true for the self-neighbor and
        # the center point). Forward value is unchanged.
        positive = sq_d > 0.0
        d = jnp.sqrt(jnp.where(positive, sq_d, 1.0))
        d = jnp.where(positive, d, 0.0)
        return jnp.maximum(1.0 - d / extent, 0.0)
    if mode == "gaussian":
        sigma = extent * 0.3
        return jnp.exp(-sq_d / (2.0 * sigma**2 + 1e-9))
    raise ValueError(f"unknown KP_influence {mode!r}")


def _rigid_core(q_pts, s_ext, x_ext, neighb_inds, kernel_points, weights,
                extent, influence, aggregation, compute_dtype):
    """Shared rigid-KPConv math; s_ext/x_ext already carry the shadow row."""
    neighbors = jnp.take(s_ext, neighb_inds, axis=0) - q_pts[:, None, :]  # [Q,nn,3]
    # |n - kp|^2 via the expansion: one [Q*nn, 3] @ [3, K] MXU matmul
    # instead of materializing the [Q, nn, K, 3] difference tensor
    # (~100 MB at level 0). Rounding differs from the direct form by
    # ~1e-6 relative, far inside the influence function's smoothness.
    n_sq = jnp.sum(neighbors * neighbors, axis=-1)        # [Q, nn]
    kp_sq = jnp.sum(kernel_points * kernel_points, axis=-1)  # [K]
    qn = neighbors.shape[0] * neighbors.shape[1]
    cross = (neighbors.reshape(qn, 3) @ kernel_points.T).reshape(
        neighbors.shape[0], neighbors.shape[1], -1
    )  # [Q, nn, K]
    sq_d = jnp.maximum(
        n_sq[:, :, None] - 2.0 * cross + kp_sq[None, None, :], 0.0
    )
    w = _influence(sq_d, extent, influence)
    if aggregation == "closest":
        one_hot = jax.nn.one_hot(jnp.argmin(sq_d, axis=-1), kernel_points.shape[0],
                                 dtype=w.dtype)
        w = w * one_hot
    elif aggregation != "sum":
        raise ValueError(f"unknown aggregation {aggregation!r}")
    w = jnp.swapaxes(w, 1, 2)  # [Q, K, nn]

    # gather features already in the compute dtype (halves gather bytes
    # under bfloat16; identical in float32 mode)
    neighb_x = jnp.take(x_ext.astype(compute_dtype), neighb_inds, axis=0)
    wt = w.astype(compute_dtype)
    xt = neighb_x
    weighted = jax.lax.dot_general(
        wt, xt, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [Q, K, Cin]
    q = weighted.shape[0]
    kf, cin, cout = weights.shape
    out = (
        weighted.reshape(q, kf * cin).astype(compute_dtype)
        @ weights.reshape(kf * cin, cout).astype(compute_dtype)
    )
    out = out.astype(jnp.float32)

    # density normalization (blocks.py:377-380)
    active = jnp.sum(neighb_x, axis=-1) > 0.0  # [Q, nn]
    denom = jnp.maximum(jnp.sum(active, axis=-1), 1).astype(out.dtype)
    return out / denom[:, None], sq_d, neighb_x


def kpconv(
    q_pts: jax.Array,
    s_pts: jax.Array,
    neighb_inds: jax.Array,
    x: jax.Array,
    params: KPConvParams,
    *,
    KP_extent: float,
    KP_influence: str = "linear",
    aggregation_mode: str = "sum",
    deformable: bool = False,
    modulated: bool = False,
    compute_dtype=jnp.float32,
):
    """Apply KPConv.

    Args:
      q_pts: [Q, 3] query points (shadow coords for padding rows).
      s_pts: [S, 3] support points.
      neighb_inds: [Q, nn] int32 with shadow == S.
      x: [S, Cin] support features (padding rows zero).

    Returns (features [Q, out_dim] float32, KPConvAux).
    """
    s_ext = jnp.concatenate(
        [s_pts, jnp.full((1, s_pts.shape[1]), SHADOW_COORD, s_pts.dtype)], axis=0
    )
    x_ext = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)

    # kernel points are a non-trainable buffer (reference blocks.py:234-235);
    # stop gradients so differentiating a full param pytree stays clean.
    kp_buf = jax.lax.stop_gradient(params.kernel_points)

    if not deformable:
        out, _, _ = _rigid_core(
            q_pts, s_ext, x_ext, neighb_inds, kp_buf, params.weights,
            KP_extent, KP_influence, aggregation_mode, compute_dtype,
        )
        return out, KPConvAux()

    # --- deformable: offsets predicted by a rigid KPConv (blocks.py:243-266)
    off, _, _ = _rigid_core(
        q_pts, s_ext, x_ext, neighb_inds,
        jax.lax.stop_gradient(params.offset_kernel_points),
        params.offset_weights, KP_extent, KP_influence, aggregation_mode,
        compute_dtype,
    )
    off = off + params.offset_bias
    k = params.kernel_points.shape[0]
    p_dim = q_pts.shape[1]
    if modulated:
        unscaled = off[:, : p_dim * k].reshape(-1, k, p_dim)
        modulations = 2.0 * jax.nn.sigmoid(off[:, p_dim * k :])  # [Q, K]
    else:
        unscaled = off.reshape(-1, k, p_dim)
        modulations = None
    deformed_kp = unscaled * KP_extent + kp_buf  # [Q, K, 3]

    neighbors = jnp.take(s_ext, neighb_inds, axis=0) - q_pts[:, None, :]
    diff = neighbors[:, :, None, :] - deformed_kp[:, None, :, :]
    sq_d = jnp.sum(diff * diff, axis=-1)  # [Q, nn, K]
    min_d2 = jnp.min(sq_d, axis=1)  # [Q, K] (blocks.py:303)

    # static-shape equivalent of the reference's neighbor pruning
    # (blocks.py:306-324): out-of-range neighbors become shadow.
    in_range = jnp.any(sq_d < KP_extent**2, axis=-1)  # [Q, nn]
    eff_inds = jnp.where(in_range, neighb_inds, s_pts.shape[0])

    w = _influence(sq_d, KP_extent, KP_influence)
    w = jnp.where(in_range[:, :, None], w, 0.0)
    if aggregation_mode == "closest":
        one_hot = jax.nn.one_hot(jnp.argmin(sq_d, axis=-1), k, dtype=w.dtype)
        w = w * one_hot
    w = jnp.swapaxes(w, 1, 2)  # [Q, K, nn]

    neighb_x = jnp.take(x_ext, eff_inds, axis=0)
    weighted = jax.lax.dot_general(
        w.astype(compute_dtype), neighb_x.astype(compute_dtype),
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    )
    if modulations is not None:
        weighted = weighted * modulations[:, :, None]
    qn = weighted.shape[0]
    kf, cin, cout = params.weights.shape
    out = (
        weighted.reshape(qn, kf * cin).astype(compute_dtype)
        @ params.weights.reshape(kf * cin, cout).astype(compute_dtype)
    ).astype(jnp.float32)

    active = jnp.sum(neighb_x, axis=-1) > 0.0
    denom = jnp.maximum(jnp.sum(active, axis=-1), 1).astype(out.dtype)
    out = out / denom[:, None]
    return out, KPConvAux(min_d2=min_d2, deformed_kp=deformed_kp)
