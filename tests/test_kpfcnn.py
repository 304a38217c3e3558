import numpy as np
import jax
import jax.numpy as jnp

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_pair
from d3feat_tpu.data.synthetic import synthetic_pair
from d3feat_tpu.models import apply_kpfcnn, init_kpfcnn, make_kpfcnn_specs
from d3feat_tpu.ops import build_pyramid, make_pyramid_spec


def tiny_config(num_layers=3):
    cfg = D3FeatConfig()
    cfg.num_layers = num_layers
    cfg.first_features_dim = 32
    cfg.first_subsampling_dl = 0.08
    cfg.caps = PyramidCaps(
        points=(1024, 512, 256, 128, 64)[:num_layers],
        neighbors=(16,) * num_layers,
        corr=32,
    )
    cfg.num_kernel_points = 15
    return cfg


def _build_inputs(rng, cfg):
    pts0, pts1, corr, dk = synthetic_pair(
        rng, n_points=400, num_corr=24, extent=2.0
    )
    packed = pack_pair(
        pts0, pts1, np.ones((400, 1), np.float32), np.ones((400, 1), np.float32),
        corr, dk, point_capacity=cfg.caps.points[0], corr_capacity=cfg.caps.corr,
    )
    spec = make_pyramid_spec(cfg, num_clouds=2)
    batch = dict(build_pyramid(jnp.asarray(packed.points),
                               jnp.asarray(packed.lengths), spec=spec))
    batch["features"] = jnp.asarray(packed.features)
    return batch, packed


def test_specs_match_reference_walk():
    """Dims from the constructor walk (architectures.py:195-297) for the
    default 5-layer config: encoder out dims double per level, decoder
    ends at 32."""
    cfg = D3FeatConfig()
    specs = make_kpfcnn_specs(cfg)
    arch = cfg.architecture()
    assert len(specs.encoder) == 14  # 2 + 4*3
    assert len(specs.decoder) == 8   # 4 upsample+unary pairs
    assert specs.encoder[0].in_dim == 1 and specs.encoder[0].out_dim == 128
    assert specs.encoder[1].in_dim == 64  # after 'simple': out/2
    assert specs.encoder[-1].out_dim == 2048
    assert specs.decoder[-1].kind == "last_unary"
    # decoder concat positions: block after each upsample
    assert specs.decoder_concats == (1, 3, 5, 7)
    # the strided block keeps the pre-increment layer index (it reads
    # pools[layer] and points[layer+1]; architectures.py:235-253)
    assert [s.layer for s in specs.encoder][:5] == [0, 0, 0, 1, 1]
    assert [s.strided for s in specs.encoder][:5] == [False, False, True, False, False]


def test_forward_shapes_and_masks(rng):
    cfg = tiny_config()
    batch, packed = _build_inputs(rng, cfg)
    params, state, specs = init_kpfcnn(jax.random.PRNGKey(0), cfg)
    out, _, _ = apply_kpfcnn(params, state, batch, cfg, specs, train=True)

    c0 = cfg.caps.points[0]
    assert out.features.shape == (c0, cfg.output_dim)
    assert out.scores.shape == (c0, 1)
    feats = np.asarray(out.features)
    scores = np.asarray(out.scores)
    assert np.all(np.isfinite(feats)) and np.all(np.isfinite(scores))

    n = int(np.asarray(batch["lengths"][0]).sum())
    norms = np.linalg.norm(feats[:n], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # padding rows: zero features, zero scores
    np.testing.assert_allclose(np.linalg.norm(feats[n:], axis=1), 0.0, atol=1e-6)
    np.testing.assert_allclose(scores[n:, 0], 0.0, atol=1e-6)
    assert scores[:n].min() >= 0.0


def test_eval_mode_hard_selection_sparsifies(rng):
    cfg = tiny_config()
    batch, _ = _build_inputs(rng, cfg)
    params, state, specs = init_kpfcnn(jax.random.PRNGKey(0), cfg)
    out_tr, _, _ = apply_kpfcnn(params, state, batch, cfg, specs, train=True)
    out_ev, _, _ = apply_kpfcnn(params, state, batch, cfg, specs, train=False)
    n = int(np.asarray(batch["lengths"][0]).sum())
    tr = np.asarray(out_tr.scores[:n, 0])
    ev = np.asarray(out_ev.scores[:n, 0])
    # eval zeroes non-local-max points (architectures.py:361-366)
    assert (ev == 0).sum() > (tr == 0).sum()
    nz = ev > 0
    np.testing.assert_allclose(ev[nz], tr[nz], rtol=1e-6)


def test_forward_jits_and_is_deterministic(rng):
    cfg = tiny_config()
    batch, _ = _build_inputs(rng, cfg)
    params, state, specs = init_kpfcnn(jax.random.PRNGKey(1), cfg)

    fwd = jax.jit(
        lambda p, s, b: apply_kpfcnn(p, s, b, cfg, specs, train=True)[0],
        static_argnames=(),
    )
    a = fwd(params, state, batch)
    b = fwd(params, state, batch)
    np.testing.assert_array_equal(np.asarray(a.features), np.asarray(b.features))


def test_grads_finite_through_full_model(rng):
    cfg = tiny_config()
    batch, packed = _build_inputs(rng, cfg)
    params, state, specs = init_kpfcnn(jax.random.PRNGKey(2), cfg)

    from d3feat_tpu.losses import circle_loss, det_loss

    corr = jnp.asarray(packed.corr)
    cvalid = jnp.asarray(packed.corr_valid)
    dk = jnp.asarray(packed.dist_keypts)
    len0 = batch["lengths"][0][0]

    def loss_fn(p):
        out, _, _ = apply_kpfcnn(p, state, batch, cfg, specs, train=True)
        anc = out.features[corr[:, 0]]
        pos = out.features[corr[:, 1] + len0]
        anc_s = out.scores[corr[:, 0]]
        pos_s = out.scores[corr[:, 1] + len0]
        r = circle_loss(anc, pos, dk, cvalid)
        dl = det_loss(r.dists, anc_s, pos_s, cvalid)
        return r.loss + dl

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_eval_gate_topm_selects_same_keypoints(rng):
    """eval_gate_topm restricts the hard local-max gate to the top-M
    candidates by ungated score. Gating only zeroes, so the top-k keypoint
    selection (the only consumer of eval scores, reference test.py:52-57)
    must be EXACTLY the full gate's whenever the top-M hold >= k detected
    points, with identical scores on the selected points."""
    cfg = tiny_config()
    batch, _ = _build_inputs(rng, cfg)
    params, state, specs = init_kpfcnn(jax.random.PRNGKey(0), cfg)
    out_full, _, _ = apply_kpfcnn(params, state, batch, cfg, specs,
                                  train=False)
    full = np.asarray(out_full.scores[:, 0])

    cfg_m = tiny_config()
    cfg_m.eval_gate_topm = 128
    out_m, _, _ = apply_kpfcnn(params, state, batch, cfg_m, specs,
                               train=False)
    gated = np.asarray(out_m.scores[:, 0])

    detected_in_topm = int((gated > 0).sum())
    k = min(32, detected_in_topm)
    assert k > 0, "fixture produced no detected candidates"
    top_full = set(np.argsort(full)[-k:][::-1].tolist())
    top_m = set(np.argsort(gated)[-k:][::-1].tolist())
    assert top_full == top_m
    idx = sorted(top_full)
    np.testing.assert_allclose(gated[idx], full[idx], rtol=0, atol=0)
    # non-candidate rows report zero (never selectable either way)
    assert (gated > 0).sum() <= cfg_m.eval_gate_topm
