"""One-step training parity on REAL TPU hardware.

The training hot loop runs the fused band kernels through their custom VJP
(ops/pallas/band_conv.band_conv_ad). This test runs ONE optimizer step of
the FULL default architecture (5 layers, dims 128..2048 — the deep-layer
weight panels exercise the lifted VMEM gate) on the same batch through

  (a) the fused path (band kernels fwd + bwd), and
  (b) the XLA gather path (bandconv_max_layer = -1; identical pyramid,
      identical sorted-space lists),

from identical initial weights, and asserts loss/metric and updated-weight
agreement. This moves the ad-hoc probe claim ("loss bit-identical",
ROUND2_NOTES) into the suite. Skipped automatically off-TPU (conftest).
"""

import numpy as np
import jax
import jax.numpy as jnp

from d3feat_tpu.config import D3FeatConfig, PyramidCaps
from d3feat_tpu.data.pack import pack_pair
from d3feat_tpu.data.synthetic import synthetic_pair
from d3feat_tpu.train.step import init_train_state, make_train_step


def _tree_rel_err(a, b):
    na, nb = 0.0, 0.0
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        na += float(jnp.sum((x.astype(jnp.float32)
                             - y.astype(jnp.float32)) ** 2))
        nb += float(jnp.sum(y.astype(jnp.float32) ** 2))
    return (na / max(nb, 1e-30)) ** 0.5


def test_one_train_step_band_vs_xla_on_hw():
    def make_cfg(max_layer):
        cfg = D3FeatConfig()
        cfg.caps = PyramidCaps(points=(2048, 1536, 1024, 512, 256),
                               neighbors=(40,) * 5, corr=32)
        cfg.query_tile = 256
        cfg.bandconv_max_layer = max_layer
        # the "xla" arm must be FULLY XLA (head included) so the band arm's
        # head kernel fwd+bwd is actually compared against the reference
        # formulation, not against itself
        cfg.bandhead_train = max_layer >= 0
        return cfg

    rng = np.random.default_rng(11)
    n = 900
    pts0, pts1, corr, dk = synthetic_pair(rng, n_points=n, num_corr=32,
                                          extent=2.5)
    b = pack_pair(pts0, pts1, np.ones((n, 1), np.float32),
                  np.ones((n, 1), np.float32), corr, dk,
                  point_capacity=2048, corr_capacity=32)
    batch = {k: jnp.asarray(v) for k, v in b._asdict().items()}

    results = {}
    for tag, max_layer in (("band", 99), ("xla", -1)):
        cfg = make_cfg(max_layer)
        ts, _ = init_train_state(jax.random.key(3), cfg)
        step = jax.jit(make_train_step(cfg))
        ts2, m = step(ts, batch, jnp.int32(0))
        jax.block_until_ready(ts2.params)
        assert float(m.overflow) == 0.0, "capacity overflow in test batch"
        assert float(m.skipped) == 0.0, "non-finite grads"
        results[tag] = (ts2, m)

    (ts_b, m_b), (ts_x, m_x) = results["band"], results["xla"]
    # losses through the two formulations agree to fp-accumulation level
    assert abs(float(m_b.loss) - float(m_x.loss)) < 1e-3 * (
        1.0 + abs(float(m_x.loss))), (float(m_b.loss), float(m_x.loss))
    assert abs(float(m_b.accuracy) - float(m_x.accuracy)) < 1.0  # percent
    # one SGD step from identical init: updated weights must stay close
    rel = _tree_rel_err(ts_b.params, ts_x.params)
    assert rel < 5e-4, f"updated-params relative error {rel}"
