import numpy as np
import jax
import jax.numpy as jnp

from d3feat_tpu.models.kpconv import KPConvParams, kpconv
from d3feat_tpu.ops.subsample import SHADOW_COORD


def np_kpconv_reference(q_pts, s_pts, inds, x, kp, W, extent, influence="linear"):
    """Literal-math reference: gather, influence weights, per-kernel matmul,
    density normalization."""
    S = len(s_pts)
    s_ext = np.concatenate([s_pts, np.full((1, 3), SHADOW_COORD)], axis=0)
    x_ext = np.concatenate([x, np.zeros((1, x.shape[1]))], axis=0)
    Q, NN = inds.shape
    K, Cin, Cout = W.shape
    out = np.zeros((Q, Cout))
    for q in range(Q):
        nb = s_ext[inds[q]] - q_pts[q]          # [NN, 3]
        d2 = ((nb[:, None, :] - kp[None]) ** 2).sum(-1)  # [NN, K]
        if influence == "linear":
            w = np.clip(1 - np.sqrt(d2) / extent, 0, None)
        elif influence == "constant":
            w = np.ones_like(d2)
        else:
            sig = extent * 0.3
            w = np.exp(-d2 / (2 * sig**2 + 1e-9))
        fx = x_ext[inds[q]]                      # [NN, Cin]
        weighted = w.T @ fx                      # [K, Cin]
        val = np.einsum("kc,kcd->d", weighted, W)
        n_active = max(1, int((fx.sum(-1) > 0).sum()))
        out[q] = val / n_active
    return out


def _setup(rng, Q=20, S=30, NN=8, K=5, Cin=4, Cout=6):
    q_pts = rng.uniform(0, 1, (Q, 3))
    s_pts = rng.uniform(0, 1, (S, 3))
    inds = rng.integers(0, S + 1, (Q, NN))  # includes shadow S
    x = rng.uniform(0.1, 1, (S, Cin))
    kp = rng.uniform(-0.1, 0.1, (K, 3))
    W = rng.normal(0, 0.1, (K, Cin, Cout))
    return q_pts, s_pts, inds, x, kp, W


def test_matches_reference_linear(rng):
    q_pts, s_pts, inds, x, kp, W = _setup(rng)
    extent = 0.4
    ref = np_kpconv_reference(q_pts, s_pts, inds, x, kp, W, extent)
    params = KPConvParams(weights=jnp.asarray(W, jnp.float32),
                          kernel_points=jnp.asarray(kp, jnp.float32))
    got, _ = kpconv(
        jnp.asarray(q_pts, jnp.float32), jnp.asarray(s_pts, jnp.float32),
        jnp.asarray(inds, jnp.int32), jnp.asarray(x, jnp.float32), params,
        KP_extent=extent,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-6)


def test_matches_reference_gaussian_and_constant(rng):
    q_pts, s_pts, inds, x, kp, W = _setup(rng)
    for influence in ("gaussian", "constant"):
        ref = np_kpconv_reference(q_pts, s_pts, inds, x, kp, W, 0.4, influence)
        params = KPConvParams(weights=jnp.asarray(W, jnp.float32),
                              kernel_points=jnp.asarray(kp, jnp.float32))
        got, _ = kpconv(
            jnp.asarray(q_pts, jnp.float32), jnp.asarray(s_pts, jnp.float32),
            jnp.asarray(inds, jnp.int32), jnp.asarray(x, jnp.float32), params,
            KP_extent=0.4, KP_influence=influence,
        )
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-6)


def test_all_shadow_row_outputs_zero(rng):
    q_pts, s_pts, inds, x, kp, W = _setup(rng)
    inds = np.asarray(inds)
    inds[3] = 30  # every neighbor is shadow
    params = KPConvParams(weights=jnp.asarray(W, jnp.float32),
                          kernel_points=jnp.asarray(kp, jnp.float32))
    got, _ = kpconv(
        jnp.asarray(q_pts, jnp.float32), jnp.asarray(s_pts, jnp.float32),
        jnp.asarray(inds, jnp.int32), jnp.asarray(x, jnp.float32), params,
        KP_extent=0.4,
    )
    np.testing.assert_allclose(np.asarray(got[3]), 0.0, atol=1e-7)


def test_grad_flows(rng):
    q_pts, s_pts, inds, x, kp, W = _setup(rng)
    params = KPConvParams(weights=jnp.asarray(W, jnp.float32),
                          kernel_points=jnp.asarray(kp, jnp.float32))

    def loss(w):
        p = params._replace(weights=w)
        out, _ = kpconv(
            jnp.asarray(q_pts, jnp.float32), jnp.asarray(s_pts, jnp.float32),
            jnp.asarray(inds, jnp.int32), jnp.asarray(x, jnp.float32), p,
            KP_extent=0.4,
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(params.weights)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_deformable_runs_and_zero_offsets_match_rigid(rng):
    from d3feat_tpu.models.kpconv import init_kpconv

    q_pts, s_pts, inds, x, kp, W = _setup(rng)
    key = jax.random.PRNGKey(0)
    params = init_kpconv(key, 5, 4, 6, kp, deformable=True)
    params = params._replace(
        weights=jnp.asarray(W, jnp.float32),
        offset_weights=jnp.zeros_like(params.offset_weights),
    )
    got, aux = kpconv(
        jnp.asarray(q_pts, jnp.float32), jnp.asarray(s_pts, jnp.float32),
        jnp.asarray(inds, jnp.int32), jnp.asarray(x, jnp.float32), params,
        KP_extent=0.4, deformable=True,
    )
    assert aux.min_d2 is not None and aux.deformed_kp is not None
    # with zero offsets the deformed conv must equal the rigid conv wherever
    # every neighbor is within extent of some kernel point; check finite+shape
    assert got.shape == (20, 6)
    assert np.all(np.isfinite(np.asarray(got)))
