"""d3feat_tpu parameter tree -> PyTorch reference ``state_dict``.

The inverse of :mod:`d3feat_tpu.compat.torch_import`: a model trained in
this framework exports to the exact key/shape layout of the reference
torch ``KPFCNN`` (reference: models/architectures.py:216-320 module tree,
trainer.py:197-210 checkpoint format), so reference-side tooling —
``test.py`` evaluation, downstream consumers of the published checkpoint
format — can consume TPU-trained weights unchanged.

Layout notes (mirror of torch_import):
  ours linear ``w`` is [in, out] -> torch Linear ``weight`` [out, in];
  KPConv ``weights`` [K, in, out] matches the reference directly;
  use_batch_norm=False exports the learned bias as the reference's
  ``batch_norm.bias`` parameter (reference blocks.py:441-473).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from d3feat_tpu.models.kpfcnn import KPFCNNSpecs, make_kpfcnn_specs


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _export_norm(out: Dict, prefix: str, params, state, use_bn: bool):
    if not use_bn:
        out[prefix + ".bias"] = _np(params["bias"])
        return
    p = prefix + ".batch_norm"
    out[p + ".weight"] = _np(params["scale"])
    out[p + ".bias"] = _np(params["offset"])
    out[p + ".running_mean"] = _np(state["mean"])
    out[p + ".running_var"] = _np(state["var"])
    out[p + ".num_batches_tracked"] = np.asarray(0, np.int64)


def _export_unary(out: Dict, prefix: str, params, state, use_bn: bool):
    out[prefix + ".mlp.weight"] = _np(params["linear"]["w"]).T  # [out, in]
    out[prefix + ".mlp.bias"] = _np(params["linear"]["b"])
    _export_norm(out, prefix + ".batch_norm", params["norm"], state, use_bn)


def _export_kpconv(out: Dict, prefix: str, conv, deformable: bool):
    out[prefix + ".weights"] = _np(conv.weights)
    out[prefix + ".kernel_points"] = _np(conv.kernel_points)
    if deformable:
        out[prefix + ".offset_conv.weights"] = _np(conv.offset_weights)
        out[prefix + ".offset_conv.kernel_points"] = _np(
            conv.offset_kernel_points)
        out[prefix + ".offset_bias"] = _np(conv.offset_bias)


def export_state_dict(
    params,
    model_state,
    config,
    specs: Optional[KPFCNNSpecs] = None,
) -> Dict[str, np.ndarray]:
    """(params, model_state) trees -> reference-layout ``state_dict``
    (numpy values; wrap with ``torch.from_numpy`` to load into the torch
    model, see :func:`save_torch_checkpoint`)."""
    specs = specs or make_kpfcnn_specs(config)
    use_bn = config.use_batch_norm
    out: Dict[str, np.ndarray] = {}

    for i, spec in enumerate(specs.encoder):
        pre = f"encoder_blocks.{i}"
        p = params["encoder"][i]
        s = model_state["encoder"][i]
        if spec.kind == "simple":
            _export_kpconv(out, pre + ".KPConv", p["conv"], spec.deformable)
            _export_norm(out, pre + ".batch_norm", p["norm"],
                         s.get("norm", {}), use_bn)
        elif spec.kind == "resnetb":
            mid = spec.out_dim // 4
            if spec.in_dim != mid:
                _export_unary(out, pre + ".unary1", p["unary1"],
                              s.get("unary1", {}), use_bn)
            _export_kpconv(out, pre + ".KPConv", p["conv"], spec.deformable)
            _export_norm(out, pre + ".batch_norm_conv", p["norm_conv"],
                         s.get("norm_conv", {}), use_bn)
            _export_unary(out, pre + ".unary2", p["unary2"],
                          s.get("unary2", {}), use_bn)
            if spec.in_dim != spec.out_dim:
                _export_unary(out, pre + ".unary_shortcut", p["shortcut"],
                              s.get("shortcut", {}), use_bn)

    for i, spec in enumerate(specs.decoder):
        pre = f"decoder_blocks.{i}"
        p = params["decoder"][i]
        s = model_state["decoder"][i]
        if spec.kind == "unary":
            _export_unary(out, pre, p, s, use_bn)
        elif spec.kind == "last_unary":
            out[pre + ".mlp.weight"] = _np(p["linear"]["w"]).T
            out[pre + ".mlp.bias"] = _np(p["linear"]["b"])
    return out


def save_torch_checkpoint(path: str, params, model_state, config,
                          specs=None, *, epoch: int = 0,
                          best_loss: float = 0.0) -> None:
    """Write a reference-format ``.pth`` snapshot (trainer.py:199-206
    layout: ``{epoch, state_dict, best_loss}``) loadable by the reference
    ``test.py --chosen_snapshot`` flow and by :func:`load_torch_checkpoint`.
    """
    import torch

    sd = {
        k: (torch.from_numpy(v.copy()) if v.dtype != np.int64
            else torch.tensor(int(v)))
        for k, v in export_state_dict(params, model_state, config,
                                      specs).items()
    }
    torch.save({"epoch": epoch, "state_dict": sd, "best_loss": best_loss},
               path)
