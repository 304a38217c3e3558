"""KPCNN: KPConv classification network.

Functional counterpart of the reference classification model
(reference: models/architectures.py:58-187). Dead code for the D3Feat
training path in the reference (never instantiated by its entry scripts)
but part of the framework's model-family surface: an encoder-only KPConv
stack ending in ``global_average``, followed by a 1024-wide unary head and
a class-logit unary, with cross-entropy + deformable-fitting loss.

The multi-cloud global average produces one feature row per cloud of the
stacked batch, so classification is batched over the stacked clouds
(reference: models/blocks.py:113-133).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from d3feat_tpu.models.blocks import (
    BlockSpec,
    apply_block,
    apply_unary,
    classify_block,
    init_block,
    init_unary,
)
from d3feat_tpu.models.kernel_points import load_kernels
from d3feat_tpu.losses.regularizers import p2p_fitting_regularizer


@dataclass(frozen=True)
class KPCNNSpecs:
    blocks: Tuple[BlockSpec, ...]
    head_in_dim: int


def classification_architecture(num_layers: int) -> List[str]:
    """Encoder-only block list ending in global pooling (the standard
    KPCNN shape: KPConv paper Table; reference arch lists are code)."""
    arch = ["simple", "resnetb"]
    for _ in range(num_layers - 1):
        arch += ["resnetb_strided", "resnetb", "resnetb"]
    return arch + ["global_average"]


def make_kpcnn_specs(config, arch: Optional[List[str]] = None) -> KPCNNSpecs:
    """Constructor walk (reference: architectures.py:72-116)."""
    if arch is None:
        arch = classification_architecture(config.num_layers)
    layer = 0
    r = config.first_subsampling_dl * config.conv_radius
    in_dim = config.in_features_dim
    out_dim = config.first_features_dim
    blocks: List[BlockSpec] = []
    for name in arch:
        if "upsample" in name:
            break
        blocks.append(
            BlockSpec(
                name=name, kind=classify_block(name), layer=layer,
                in_dim=in_dim, out_dim=out_dim, radius=r,
                strided="strided" in name, deformable="deform" in name,
            )
        )
        in_dim = out_dim // 2 if "simple" in name else out_dim
        if "pool" in name or "strided" in name:
            layer += 1
            r *= 2
            out_dim *= 2
    return KPCNNSpecs(blocks=tuple(blocks), head_in_dim=in_dim)


def init_kpcnn(key, config, specs: Optional[KPCNNSpecs] = None):
    """Returns (params, state, specs). Head: unary(1024) + unary(num_classes)
    (reference: architectures.py:118-119)."""
    specs = specs or make_kpcnn_specs(config)
    unit_kp = load_kernels(
        1.0, config.num_kernel_points, dimension=config.in_points_dim,
        fixed=config.fixed_kernel_points,
        deterministic=getattr(config, "deterministic_kernel_points", True),
        seed=getattr(config, "seed", 0),
    )
    keys = jax.random.split(key, len(specs.blocks) + 2)
    params: Dict = {"blocks": [], "head_mlp": None, "head_softmax": None}
    state: Dict = {"blocks": []}
    for i, spec in enumerate(specs.blocks):
        p, s = init_block(keys[i], spec, config, unit_kp * spec.radius)
        params["blocks"].append(p)
        state["blocks"].append(s)
    params["head_mlp"], state["head_mlp"] = init_unary(
        keys[-2], specs.head_in_dim, 1024, config.use_batch_norm
    )
    params["head_softmax"], state["head_softmax"] = init_unary(
        keys[-1], 1024, config.num_classes, config.use_batch_norm
    )
    return params, state, specs


def apply_kpcnn(params, state, batch, config, specs: KPCNNSpecs, *,
                train: bool = False, compute_dtype=jnp.float32):
    """Forward: [B, num_classes] logits (one row per stacked cloud).

    Returns (logits, new_state, auxes)."""
    x = batch["features"].astype(jnp.float32)
    x = x * batch["masks"][0][:, None]
    new_state: Dict = {"blocks": []}
    auxes = []
    for i, spec in enumerate(specs.blocks):
        x, s, aux = apply_block(
            params["blocks"][i], state["blocks"][i], spec, x, batch, config,
            train=train, compute_dtype=compute_dtype,
        )
        new_state["blocks"].append(s)
        if aux is not None and aux.min_d2 is not None:
            auxes.append(aux)

    b = batch["lengths"][-1].shape[0]
    ones = jnp.ones((b,), bool)
    x, new_state["head_mlp"] = apply_unary(
        params["head_mlp"], state["head_mlp"], x, ones,
        use_bn=config.use_batch_norm, momentum=config.batch_norm_momentum,
        train=train, compute_dtype=compute_dtype,
    )
    x, new_state["head_softmax"] = apply_unary(
        params["head_softmax"], state["head_softmax"], x, ones,
        use_bn=config.use_batch_norm, momentum=config.batch_norm_momentum,
        train=train, relu=False, compute_dtype=compute_dtype,
    )
    return x, new_state, auxes


def kpcnn_loss(logits, labels, auxes, config):
    """Cross entropy + deformable regularizer
    (reference: architectures.py:155-173)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
    reg = 0.0
    if auxes:
        reg = p2p_fitting_regularizer(
            auxes, KP_extent=config.KP_extent,
            repulse_extent=getattr(config, "repulse_extent", 1.2),
            deform_fitting_power=getattr(config, "deform_fitting_power", 1.0),
        )
    return ce + reg, ce


def kpcnn_accuracy(logits, labels) -> jax.Array:
    """Fraction of correct argmax predictions (architectures.py:175-187)."""
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
