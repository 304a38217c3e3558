"""Optimizer semantics vs torch.optim (the reference's optimizers).

The reference trains with torch SGD(momentum=0.98, weight_decay=1e-6) or
Adam (reference: training_3DMatch.py:62-81). Our optax chain + external
lr scaling must produce the same parameter trajectories.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from d3feat_tpu.config import D3FeatConfig  # noqa: E402
from d3feat_tpu.train.optim import learning_rate, make_optimizer  # noqa: E402


def _run_pair(optimizer_name, steps=6):
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(steps)]

    cfg = D3FeatConfig()
    cfg.optimizer = optimizer_name
    cfg.lr = 0.05
    cfg.weight_decay = 1e-2  # large enough to matter
    cfg.momentum = 0.98

    tx = make_optimizer(cfg)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    lr = learning_rate(cfg, 0)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(
            params, jax.tree.map(lambda u: -lr * u, updates)
        )

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    if optimizer_name == "SGD":
        opt = torch.optim.SGD([wt], lr=cfg.lr, momentum=cfg.momentum,
                              weight_decay=cfg.weight_decay)
    else:
        opt = torch.optim.Adam([wt], lr=cfg.lr,
                               weight_decay=cfg.weight_decay)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), atol=2e-6,
    )


def test_sgd_matches_torch():
    _run_pair("SGD")


def test_adam_matches_torch():
    _run_pair("ADAM")
