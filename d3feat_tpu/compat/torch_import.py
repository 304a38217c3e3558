"""PyTorch checkpoint -> d3feat_tpu parameter-tree conversion.

Imports reference-trained weights (reference: trainer.py:197-210 saves
``{epoch, state_dict, optimizer, scheduler, best_loss}``; README.md:49
links the pretrained model) into the functional parameter tree produced by
:func:`d3feat_tpu.models.kpfcnn.init_kpfcnn`, for golden-checkpoint parity
(BASELINE.md: feature-match recall within 0.5% of the reference model).

Key correspondence (reference torch module names -> our tree):
  encoder_blocks.{i}.KPConv.weights            -> encoder[i].conv.weights  [K,in,out]
  encoder_blocks.{i}.KPConv.kernel_points      -> encoder[i].conv.kernel_points
  encoder_blocks.{i}.KPConv.offset_conv.*      -> encoder[i].conv.offset_* (deformable)
  encoder_blocks.{i}.unary{1,2}.mlp.{weight,bias} -> encoder[i].unary{1,2}.linear.{w.T,b}
  encoder_blocks.{i}.unary_shortcut.mlp.*      -> encoder[i].shortcut.linear.*
  encoder_blocks.{i}.batch_norm[_conv].bias    -> .norm[_conv].bias      (use_bn=False)
  encoder_blocks.{i}.*.batch_norm.batch_norm.* -> scale/offset (+ running stats
                                                  into model_state)      (use_bn=True)
  decoder_blocks.{i}.mlp.* / batch_norm.*      -> decoder[i] (unary / last_unary)

torch Linear stores [out, in]; ours is [in, out] (transposed at import).
KPConv weight layout [K, in, out] matches directly (reference blocks.py:183).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from d3feat_tpu.models.kpconv import KPConvParams
from d3feat_tpu.models.kpfcnn import KPFCNNSpecs, make_kpfcnn_specs


def _t(x) -> np.ndarray:
    """torch tensor / ndarray -> float32 ndarray."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


class _SD:
    """State-dict view with presence tracking."""

    def __init__(self, sd: Dict[str, Any]):
        self.sd = sd
        self.used = set()

    def __contains__(self, key: str) -> bool:
        return key in self.sd

    def get(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"checkpoint is missing {key!r}")
        self.used.add(key)
        return _t(self.sd[key])

    def unused(self):
        return [
            k for k in self.sd
            if k not in self.used and "num_batches_tracked" not in k
        ]


def _convert_norm(sd: _SD, prefix: str, use_bn: bool):
    """-> (norm_params, norm_state) for one BatchNormBlock
    (reference: blocks.py:441-478)."""
    if not use_bn:
        return {"bias": jnp.asarray(sd.get(prefix + ".bias"))}, {}
    p = prefix + ".batch_norm"
    params = {
        "scale": jnp.asarray(sd.get(p + ".weight")),
        "offset": jnp.asarray(sd.get(p + ".bias")),
    }
    state = {
        "mean": jnp.asarray(sd.get(p + ".running_mean")),
        "var": jnp.asarray(sd.get(p + ".running_var")),
    }
    return params, state


def _convert_unary(sd: _SD, prefix: str, use_bn: bool):
    """UnaryBlock: mlp Linear + norm (reference: blocks.py:481-515)."""
    w = sd.get(prefix + ".mlp.weight").T  # [out,in] -> [in,out]
    b = sd.get(prefix + ".mlp.bias")
    norm_p, norm_s = _convert_norm(sd, prefix + ".batch_norm", use_bn)
    return (
        {"linear": {"w": jnp.asarray(w), "b": jnp.asarray(b)}, "norm": norm_p},
        norm_s,
    )


def _convert_kpconv(sd: _SD, prefix: str, deformable: bool) -> KPConvParams:
    kw = dict(
        weights=jnp.asarray(sd.get(prefix + ".weights")),
        kernel_points=jnp.asarray(sd.get(prefix + ".kernel_points")),
    )
    if deformable:
        kw["offset_weights"] = jnp.asarray(sd.get(prefix + ".offset_conv.weights"))
        kw["offset_kernel_points"] = jnp.asarray(
            sd.get(prefix + ".offset_conv.kernel_points")
        )
        kw["offset_bias"] = jnp.asarray(sd.get(prefix + ".offset_bias"))
    return KPConvParams(**kw)


def convert_state_dict(
    state_dict: Dict[str, Any],
    config,
    specs: Optional[KPFCNNSpecs] = None,
    *,
    strict: bool = True,
) -> Tuple[Dict, Dict]:
    """Reference KPFCNN ``state_dict`` -> (params, model_state) trees
    structured exactly like :func:`init_kpfcnn`'s output."""
    specs = specs or make_kpfcnn_specs(config)
    sd = _SD(state_dict)
    use_bn = config.use_batch_norm
    params: Dict[str, list] = {"encoder": [], "decoder": []}
    state: Dict[str, list] = {"encoder": [], "decoder": []}

    for i, spec in enumerate(specs.encoder):
        pre = f"encoder_blocks.{i}"
        if spec.kind == "simple":
            p = {
                "conv": _convert_kpconv(sd, pre + ".KPConv", spec.deformable),
            }
            p["norm"], s_norm = _convert_norm(sd, pre + ".batch_norm", use_bn)
            params["encoder"].append(p)
            state["encoder"].append({"norm": s_norm})
        elif spec.kind == "resnetb":
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            mid = spec.out_dim // 4
            if spec.in_dim != mid:
                p["unary1"], s["unary1"] = _convert_unary(
                    sd, pre + ".unary1", use_bn
                )
            p["conv"] = _convert_kpconv(sd, pre + ".KPConv", spec.deformable)
            p["norm_conv"], s["norm_conv"] = _convert_norm(
                sd, pre + ".batch_norm_conv", use_bn
            )
            p["unary2"], s["unary2"] = _convert_unary(sd, pre + ".unary2", use_bn)
            if spec.in_dim != spec.out_dim:
                p["shortcut"], s["shortcut"] = _convert_unary(
                    sd, pre + ".unary_shortcut", use_bn
                )
            params["encoder"].append(p)
            state["encoder"].append(s)
        else:
            params["encoder"].append({})
            state["encoder"].append({})

    for i, spec in enumerate(specs.decoder):
        pre = f"decoder_blocks.{i}"
        if spec.kind == "unary":
            p, s = _convert_unary(sd, pre, use_bn)
            params["decoder"].append(p)
            state["decoder"].append(s)
        elif spec.kind == "last_unary":
            w = sd.get(pre + ".mlp.weight").T
            b = sd.get(pre + ".mlp.bias")
            params["decoder"].append(
                {"linear": {"w": jnp.asarray(w), "b": jnp.asarray(b)}}
            )
            state["decoder"].append({})
        else:
            params["decoder"].append({})
            state["decoder"].append({})

    if strict:
        leftovers = sd.unused()
        if leftovers:
            raise ValueError(f"unconverted checkpoint keys: {leftovers[:8]}"
                             f"{'...' if len(leftovers) > 8 else ''}")
    return params, state


def load_torch_checkpoint(path: str, config, specs=None, *, strict: bool = True):
    """Load a reference ``.pth`` snapshot (full dict or bare state_dict).

    Returns (params, model_state, meta) where meta carries epoch/best_loss
    when present (reference checkpoint layout, trainer.py:199-206).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        sd = blob["state_dict"]
        meta = {k: blob[k] for k in ("epoch", "best_loss") if k in blob}
    else:
        sd, meta = blob, {}
    params, state = convert_state_dict(sd, config, specs, strict=strict)
    return params, state, meta
