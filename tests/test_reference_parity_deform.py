"""Deformable-KPConv forward parity vs the reference implementation.

The reference dynamically prunes out-of-range neighbors with topk
(reference: models/blocks.py:306-324); our static-shape version masks them
to shadow instead — this test proves the observable outputs coincide.
"""

import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(REF), reason="reference tree not mounted"
)

import jax.numpy as jnp  # noqa: E402

from d3feat_tpu.compat.torch_import import convert_state_dict  # noqa: E402
from d3feat_tpu.config import D3FeatConfig, PyramidCaps  # noqa: E402
from d3feat_tpu.data.pack import pack_pair  # noqa: E402
from d3feat_tpu.data.synthetic import synthetic_pair  # noqa: E402
from d3feat_tpu.models import apply_kpfcnn, make_kpfcnn_specs  # noqa: E402
from d3feat_tpu.ops import build_pyramid, make_pyramid_spec  # noqa: E402


class DeformConfig(D3FeatConfig):
    def architecture(self):
        return [
            "simple", "resnetb", "resnetb_deformable_strided",
            "resnetb_deformable", "nearest_upsample", "last_unary",
        ]


def _cfg(n_total, modulated):
    cfg = DeformConfig()
    cfg.num_layers = 2
    cfg.first_features_dim = 24
    cfg.first_subsampling_dl = 0.1
    cfg.modulated = modulated
    cfg.caps = PyramidCaps(points=(n_total, 256), neighbors=(14, 14), corr=16)
    cfg.query_tile = 128
    return cfg


def _ref_config(cfg):
    ns = types.SimpleNamespace()
    for name in (
        "in_points_dim", "in_features_dim", "first_features_dim",
        "first_subsampling_dl", "conv_radius", "deform_radius",
        "num_kernel_points", "KP_extent", "KP_influence", "aggregation_mode",
        "fixed_kernel_points", "use_batch_norm", "batch_norm_momentum",
        "modulated", "deformable",
    ):
        setattr(ns, name, getattr(cfg, name))
    ns.architecture = cfg.architecture()
    return ns


@pytest.mark.parametrize("modulated", [False, True])
def test_deformable_forward_parity(modulated):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.architectures import KPFCNN  # type: ignore

    rng = np.random.default_rng(11)
    n = 220
    pts0, pts1, corr, dk = synthetic_pair(rng, n_points=n, num_corr=12,
                                          extent=2.0)
    n_total = 2 * n
    cfg = _cfg(n_total, modulated)
    packed = pack_pair(
        pts0, pts1, np.ones((n, 1), np.float32), np.ones((n, 1), np.float32),
        corr, dk, point_capacity=n_total, corr_capacity=16,
    )
    pyr = dict(build_pyramid(jnp.asarray(packed.points),
                             jnp.asarray(packed.lengths),
                             spec=make_pyramid_spec(cfg, num_clouds=2)))
    pyr["features"] = jnp.asarray(packed.features)

    torch.manual_seed(1)
    ref_model = KPFCNN(_ref_config(cfg)).eval()
    # non-zero offsets so the deformable path actually deforms
    with torch.no_grad():
        for name, p in ref_model.named_parameters():
            if "offset" in name:
                p.add_(torch.randn_like(p) * 0.05)

    specs = make_kpfcnn_specs(cfg)
    assert any(s.deformable for s in specs.encoder)
    params, state = convert_state_dict(ref_model.state_dict(), cfg, specs,
                                       strict=True)

    tt = lambda a, dt=torch.float32: torch.from_numpy(np.asarray(a).copy()).to(dt)
    batch_t = {
        "points": [tt(p) for p in pyr["points"]],
        "neighbors": [tt(x, torch.long) for x in pyr["neighbors"]],
        "pools": [tt(x, torch.long) for x in pyr["pools"]],
        "upsamples": [tt(x, torch.long) for x in pyr["upsamples"]],
        "features": tt(packed.features),
        "stack_lengths": [tt(np.asarray(l), torch.long) for l in pyr["lengths"]],
    }
    with torch.no_grad():
        ref_feat, ref_score = ref_model(batch_t)

    out, _, auxes = apply_kpfcnn(params, state, pyr, cfg, specs, train=False)
    assert len(auxes) == 2  # two deformable convs report regularizer aux

    n_tot = int(np.sum(np.asarray(packed.lengths)))
    np.testing.assert_allclose(
        np.asarray(out.features)[:n_tot], ref_feat.numpy()[:n_tot],
        atol=5e-5, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out.scores)[:n_tot, 0], ref_score.numpy()[:n_tot, 0],
        atol=5e-5, rtol=1e-3,
    )
