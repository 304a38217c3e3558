import numpy as np
import jax.numpy as jnp

from d3feat_tpu.losses import circle_loss, contrastive_loss, det_loss, cdist


def np_cdist_euclidean(a, b):
    return np.sqrt(((a[:, None] - b[None]) ** 2).sum(-1) + 1e-12)


def np_circle_loss(anchor, positive, dist_keypts, log_scale=10.0,
                   safe_radius=0.10, pos_margin=0.1, neg_margin=1.4):
    """Literal-math reference of the circle loss on an unpadded batch."""
    n = len(anchor)
    dists = np_cdist_euclidean(anchor, positive)
    eye = np.eye(n, dtype=bool)
    neg_mask = dist_keypts > safe_radius

    pos = dists - 1e5 * neg_mask
    pos_w = np.maximum(pos - pos_margin, 0.0)

    def lse(x, axis):
        return np.log(np.sum(np.exp(x), axis=axis))

    lse_pos_row = lse(log_scale * (pos - pos_margin) * pos_w, -1)
    lse_pos_col = lse(log_scale * (pos - pos_margin) * pos_w, -2)

    neg = dists + 1e5 * (~neg_mask)
    neg_w = np.maximum(neg_margin - neg, 0.0)
    lse_neg_row = lse(log_scale * (neg_margin - neg) * neg_w, -1)
    lse_neg_col = lse(log_scale * (neg_margin - neg) * neg_w, -2)

    sp = lambda x: np.log1p(np.exp(x))
    loss = sp(lse_pos_row + lse_neg_row) / log_scale + sp(lse_pos_col + lse_neg_col) / log_scale
    fp = np.max(dists * eye, axis=1)
    cn = np.min(dists + 1e5 * eye, axis=1)
    acc = (fp - cn < 0).sum() * 100.0 / n
    return np.mean(loss), acc, dists


def _batch(rng, n=24, d=8):
    a = rng.normal(size=(n, d))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    p = a + 0.1 * rng.normal(size=(n, d))
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    keypts = rng.uniform(0, 2, size=(n, 3))
    dk = np.linalg.norm(keypts[:, None] - keypts[None], axis=-1)
    return a, p, dk


def _pad(x, m):
    out = np.zeros((m,) + x.shape[1:], x.dtype)
    out[: len(x)] = x
    return out


def test_circle_loss_matches_reference_unpadded(rng):
    a, p, dk = _batch(rng)
    ref_loss, ref_acc, _ = np_circle_loss(a, p, dk)
    valid = np.ones(24, bool)
    got = circle_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(dk),
                      jnp.asarray(valid))
    np.testing.assert_allclose(float(got.loss), ref_loss, rtol=1e-5)
    np.testing.assert_allclose(float(got.accuracy), ref_acc, rtol=1e-6)


def test_circle_loss_padding_invariant(rng):
    """Loss on n valid rows must be identical whether padded to 24 or 40."""
    a, p, dk = _batch(rng, n=24)
    valid24 = np.ones(24, bool)
    r24 = circle_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(dk),
                      jnp.asarray(valid24))
    a40, p40 = _pad(a, 40), _pad(p, 40)
    dk40 = np.full((40, 40), 5.0)
    dk40[:24, :24] = dk
    valid40 = np.arange(40) < 24
    r40 = circle_loss(jnp.asarray(a40), jnp.asarray(p40), jnp.asarray(dk40),
                      jnp.asarray(valid40))
    np.testing.assert_allclose(float(r40.loss), float(r24.loss), rtol=1e-5)
    np.testing.assert_allclose(float(r40.accuracy), float(r24.accuracy))
    np.testing.assert_allclose(float(r40.d_pos), float(r24.d_pos), rtol=1e-5)
    np.testing.assert_allclose(float(r40.d_neg), float(r24.d_neg), rtol=1e-5)


def test_contrastive_loss_basic_and_padding(rng):
    a, p, dk = _batch(rng)
    valid = np.ones(24, bool)
    r = contrastive_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(dk),
                         jnp.asarray(valid))
    assert np.isfinite(float(r.loss))
    # hand-check: loss = mean(max(fp - 0.1, 0) + max(1.4 - cn, 0))
    d = np_cdist_euclidean(a, p)
    d = d + 10.0 * (((dk + 10 * np.eye(24)) < 0.25))
    fp = np.max(d * np.eye(24), axis=1)
    cn = np.min(d + 1e5 * np.eye(24), axis=1)
    want = np.mean(np.maximum(fp - 0.1, 0) + np.maximum(1.4 - cn, 0))
    np.testing.assert_allclose(float(r.loss), want, rtol=1e-5)

    a40, p40 = _pad(a, 40), _pad(p, 40)
    dk40 = np.full((40, 40), 5.0)
    dk40[:24, :24] = dk
    r40 = contrastive_loss(jnp.asarray(a40), jnp.asarray(p40),
                           jnp.asarray(dk40), jnp.asarray(np.arange(40) < 24))
    np.testing.assert_allclose(float(r40.loss), float(r.loss), rtol=1e-5)


def test_det_loss_sign_and_padding(rng):
    a, p, dk = _batch(rng)
    valid = np.ones(24, bool)
    r = circle_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(dk),
                    jnp.asarray(valid))
    anc_s = np.abs(rng.normal(size=(24, 1)))
    pos_s = np.abs(rng.normal(size=(24, 1)))
    dl = det_loss(r.dists, jnp.asarray(anc_s), jnp.asarray(pos_s),
                  jnp.asarray(valid))
    d = np.asarray(r.dists)
    fp = np.max(d * np.eye(24), axis=1)
    cn = np.min(d + 1e5 * np.eye(24), axis=1)
    want = np.mean((fp - cn) * (anc_s[:, 0] + pos_s[:, 0]))
    np.testing.assert_allclose(float(dl), want, rtol=1e-5)

    # padded version identical
    dists40 = np.full((40, 40), 7.0, np.float32)
    dists40[:24, :24] = d
    dl40 = det_loss(jnp.asarray(dists40), jnp.asarray(_pad(anc_s, 40)),
                    jnp.asarray(_pad(pos_s, 40)), jnp.asarray(np.arange(40) < 24))
    np.testing.assert_allclose(float(dl40), want, rtol=1e-5)


def test_cdist_metrics(rng):
    a = rng.normal(size=(5, 4))
    b = rng.normal(size=(7, 4))
    got = np.asarray(cdist(jnp.asarray(a), jnp.asarray(b), "euclidean"))
    np.testing.assert_allclose(got, np_cdist_euclidean(a, b), rtol=1e-6)
    got = np.asarray(cdist(jnp.asarray(a), jnp.asarray(b), "sqeuclidean"))
    np.testing.assert_allclose(got, ((a[:, None] - b[None]) ** 2).sum(-1), rtol=1e-5)
    got = np.asarray(cdist(jnp.asarray(a), jnp.asarray(b), "cityblock"))
    np.testing.assert_allclose(got, np.abs(a[:, None] - b[None]).sum(-1), rtol=1e-5)
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    got = np.asarray(cdist(jnp.asarray(an), jnp.asarray(bn), "cosine"))
    np.testing.assert_allclose(got, np.sqrt(np.maximum(2 - 2 * an @ bn.T, 0)),
                               rtol=1e-4, atol=1e-4)
