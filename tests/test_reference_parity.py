"""Golden numerical parity vs. the reference PyTorch implementation.

Instantiates the actual reference KPFCNN (pure torch+numpy import chain —
the C++ modules are only used by its data pipeline, which we replace), runs
it on OUR on-device pyramid structure, and compares descriptors/scores
against our functional forward with weights imported through
``compat.torch_import``. This is the SURVEY.md §4 golden-model anchor,
executed at init-weight level (the released pretrained checkpoint, when
present at tests/data/, runs through the same path).

The level-0 capacity is set to the exact stacked point count so the
reference's unpadded global-max normalization (architectures.py:342) sees
the same rows as our masked version.
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from d3feat_tpu.compat.torch_import import convert_state_dict  # noqa: E402
from d3feat_tpu.config import D3FeatConfig, PyramidCaps  # noqa: E402
from d3feat_tpu.data.pack import pack_pair  # noqa: E402
from d3feat_tpu.data.synthetic import synthetic_pair  # noqa: E402
from d3feat_tpu.models import apply_kpfcnn, make_kpfcnn_specs  # noqa: E402
from d3feat_tpu.ops import build_pyramid, make_pyramid_spec  # noqa: E402


def _import_reference_kpfcnn():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.architectures import KPFCNN  # type: ignore

    return KPFCNN


def _tiny_cfg(n_total):
    cfg = D3FeatConfig()
    cfg.num_layers = 3
    cfg.first_features_dim = 32
    cfg.first_subsampling_dl = 0.08
    # exact L0 capacity: no padding rows at level 0 (see module docstring)
    cfg.caps = PyramidCaps(points=(n_total, 512, 256), neighbors=(16, 16, 16),
                           corr=32)
    cfg.query_tile = 128
    return cfg


def _ref_config(cfg: D3FeatConfig):
    ns = types.SimpleNamespace()
    ns.architecture = cfg.architecture()
    ns.in_points_dim = cfg.in_points_dim
    ns.in_features_dim = cfg.in_features_dim
    ns.first_features_dim = cfg.first_features_dim
    ns.first_subsampling_dl = cfg.first_subsampling_dl
    ns.conv_radius = cfg.conv_radius
    ns.deform_radius = cfg.deform_radius
    ns.num_kernel_points = cfg.num_kernel_points
    ns.KP_extent = cfg.KP_extent
    ns.KP_influence = cfg.KP_influence
    ns.aggregation_mode = cfg.aggregation_mode
    ns.fixed_kernel_points = cfg.fixed_kernel_points
    ns.use_batch_norm = cfg.use_batch_norm
    ns.batch_norm_momentum = cfg.batch_norm_momentum
    ns.modulated = cfg.modulated
    ns.deformable = cfg.deformable
    return ns


@pytest.fixture(scope="module")
def parity_setup():
    rng = np.random.default_rng(7)
    n = 300
    pts0, pts1, corr, dk = synthetic_pair(rng, n_points=n, num_corr=16,
                                          extent=2.0)
    n_total = 2 * n
    cfg = _tiny_cfg(n_total)
    packed = pack_pair(
        pts0, pts1, np.ones((n, 1), np.float32), np.ones((n, 1), np.float32),
        corr, dk, point_capacity=n_total, corr_capacity=cfg.caps.corr,
    )
    spec = make_pyramid_spec(cfg, num_clouds=2)
    pyr = build_pyramid(jnp.asarray(packed.points),
                        jnp.asarray(packed.lengths), spec=spec)
    pyr = dict(pyr)
    pyr["features"] = jnp.asarray(packed.features)

    KPFCNN = _import_reference_kpfcnn()
    torch.manual_seed(0)
    ref_model = KPFCNN(_ref_config(cfg)).eval()

    specs = make_kpfcnn_specs(cfg)
    params, model_state = convert_state_dict(
        ref_model.state_dict(), cfg, specs, strict=True
    )
    return cfg, specs, params, model_state, pyr, ref_model, packed


def _torch_batch(pyr, packed):
    tt = lambda a, dt=torch.float32: torch.from_numpy(np.asarray(a)).to(dt)
    return {
        "points": [tt(p) for p in pyr["points"]],
        "neighbors": [tt(n, torch.long) for n in pyr["neighbors"]],
        "pools": [tt(p, torch.long) for p in pyr["pools"]],
        "upsamples": [tt(u, torch.long) for u in pyr["upsamples"]],
        "features": tt(packed.features),
        "stack_lengths": [tt(np.asarray(l), torch.long) for l in pyr["lengths"]],
    }


def test_forward_parity_eval_mode(parity_setup):
    cfg, specs, params, model_state, pyr, ref_model, packed = parity_setup
    with torch.no_grad():
        ref_feat, ref_score = ref_model(_torch_batch(pyr, packed))
    out, _, _ = apply_kpfcnn(params, model_state, pyr, cfg, specs, train=False)

    n_total = int(np.sum(np.asarray(packed.lengths)))
    ours_f = np.asarray(out.features)[:n_total]
    ref_f = ref_feat.numpy()[:n_total]
    np.testing.assert_allclose(ours_f, ref_f, atol=2e-5, rtol=1e-4)

    ours_s = np.asarray(out.scores)[:n_total, 0]
    ref_s = ref_score.numpy()[:n_total, 0]
    np.testing.assert_allclose(ours_s, ref_s, atol=2e-5, rtol=1e-4)
    # eval-mode hard local-max gate actually fires on both
    assert (ours_s == 0).any() and (ours_s > 0).any()


def test_forward_parity_train_mode(parity_setup):
    cfg, specs, params, model_state, pyr, ref_model, packed = parity_setup
    ref_model.train()
    with torch.no_grad():
        ref_feat, ref_score = ref_model(_torch_batch(pyr, packed))
    ref_model.eval()
    out, _, _ = apply_kpfcnn(params, model_state, pyr, cfg, specs, train=True)
    n_total = int(np.sum(np.asarray(packed.lengths)))
    np.testing.assert_allclose(
        np.asarray(out.scores)[:n_total, 0], ref_score.numpy()[:n_total, 0],
        atol=2e-5, rtol=1e-4,
    )


def test_convert_rejects_missing_keys(parity_setup):
    cfg, specs, params, model_state, pyr, ref_model, packed = parity_setup
    sd = dict(ref_model.state_dict())
    key = next(k for k in sd if k.endswith("KPConv.weights"))
    del sd[key]
    with pytest.raises(KeyError):
        convert_state_dict(sd, cfg, specs, strict=True)
