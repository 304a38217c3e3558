"""Deformable-KPConv regularizers.

Counterpart of the reference p2p fitting regularizer
(reference: models/architectures.py:22-55): for every deformable conv,
(a) fitting — L1 of the min squared distance from each deformed kernel
point to the input points, normalized by extent^2; (b) repulsion — squared
hinge on pairwise kernel-point distances below ``repulse_extent``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import jax
import jax.numpy as jnp

if TYPE_CHECKING:  # avoid a models <-> losses import cycle at runtime
    from d3feat_tpu.models.kpconv import KPConvAux


def p2p_fitting_regularizer(
    auxes: "Sequence[KPConvAux]",
    *,
    KP_extent: float,
    repulse_extent: float = 1.2,
    deform_fitting_power: float = 1.0,
) -> jax.Array:
    """Scalar regularizer over all deformable convs' aux outputs."""
    fitting = 0.0
    repulsive = 0.0
    for aux in auxes:
        if aux.min_d2 is None:
            continue
        kp_min_d2 = aux.min_d2 / (KP_extent**2)
        fitting = fitting + jnp.mean(jnp.abs(kp_min_d2))

        locs = aux.deformed_kp / KP_extent  # [Q, K, 3]
        k = locs.shape[1]
        diff = locs[:, :, None, :] - jax.lax.stop_gradient(locs[:, None, :, :])
        dist = jnp.sqrt(jnp.sum(diff**2, axis=-1) + 1e-12)  # [Q, K, K]
        off_diag = ~jnp.eye(k, dtype=bool)
        hinge = jnp.minimum(dist - repulse_extent, 0.0) ** 2
        rep = jnp.sum(jnp.where(off_diag, hinge, 0.0), axis=2)  # [Q, K]
        repulsive = repulsive + jnp.mean(jnp.sum(rep, axis=1)) / k

    return deform_fitting_power * (2.0 * fitting + repulsive)
