"""Optimizer and learning-rate schedule.

Reproduces the reference's optimization semantics (reference:
training_3DMatch.py:62-81) with optax transforms:

* SGD with momentum 0.98 and L2 weight decay 1e-6 — torch SGD semantics
  (decay folded into the gradient, then a momentum trace, dampening 0);
* or Adam with the same L2-into-gradient weight decay;
* ExponentialLR with gamma = 0.1^(1/80), stepped once every
  ``scheduler_interval`` epochs (reference: trainer.py:60-61) — expressed
  here as a pure function of the epoch index so the whole update stays
  inside one jitted program (no recompilation across epochs).

The learning rate is applied *outside* the optax chain (the chain returns
ascent-direction updates; the train step scales by ``-lr(epoch)``), so a
single compiled step serves every epoch.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def make_optimizer(config) -> optax.GradientTransformation:
    """LR-free gradient transformation; pair with :func:`learning_rate`."""
    # optional global-norm gradient clip (off by default, matching the
    # reference, whose only guard is the non-finite step skip)
    clip = (
        [optax.clip_by_global_norm(config.grad_clip_norm)]
        if getattr(config, "grad_clip_norm", 0.0) > 0.0
        else []
    )
    name = config.optimizer.upper()
    if name == "SGD":
        return optax.chain(
            *clip,
            optax.add_decayed_weights(config.weight_decay),
            optax.trace(decay=config.momentum, nesterov=False),
        )
    if name in ("ADAM", "ADAMW"):
        # reference uses torch.optim.Adam(weight_decay=...) = L2 into grad
        return optax.chain(
            *clip,
            optax.add_decayed_weights(config.weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        )
    raise ValueError(f"unknown optimizer {config.optimizer!r}")


def learning_rate(config, epoch) -> jnp.ndarray:
    """lr during ``epoch`` (0-indexed): base * gamma^floor(epoch/interval).

    The reference steps ExponentialLR at the end of every epoch where
    ``(epoch+1) % scheduler_interval == 0`` (trainer.py:60-61), so by the
    start of epoch e the scheduler has fired floor(e/interval) times.
    """
    steps = jnp.asarray(epoch, jnp.float32) // float(config.scheduler_interval)
    return config.lr * jnp.power(jnp.float32(config.scheduler_gamma), steps)
