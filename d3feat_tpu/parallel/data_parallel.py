"""shard_map'd data-parallel train / eval / extraction steps.

Each device of the 1-D mesh processes one full fragment pair per step
(batch_size stays 1 per device, matching the reference's hard assumption,
reference: datasets/dataloader.py:73); parameters and optimizer state are
replicated, gradients and metrics are ``pmean``'d inside the step so every
device applies the identical update. XLA lowers the pmean to an ICI
all-reduce — there is no hand-written communication anywhere.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from d3feat_tpu.train.step import (
    TrainState,
    make_eval_step,
    make_extract_step,
    make_train_step,
)


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_vma=False)


def make_dp_train_step(config, mesh: Mesh, specs=None, pyramid_spec=None,
                       optimizer=None, axis: str = "data"):
    """Data-parallel train step over ``mesh``.

    Returns jitted ``fn(train_state, batch, epoch) -> (train_state, metrics)``
    where every array in ``batch`` has a leading device axis of size
    ``mesh.shape[axis]`` (use :func:`d3feat_tpu.parallel.mesh.stack_shard_batch`).
    """
    if config.use_batch_norm and mesh.devices.size > 1:
        # Each device would accumulate BN running stats from its own local
        # fragment pair; the replicated out-spec for model_state would then
        # be unsound. The default config uses bias-only norm — cross-device
        # BN-stat averaging is not implemented.
        raise NotImplementedError(
            "data-parallel training with use_batch_norm=True diverges "
            "per-device batch-norm statistics; use the default bias norm"
        )
    step = make_train_step(config, specs, pyramid_spec, optimizer,
                           axis_name=axis)

    def device_step(ts: TrainState, batch, epoch):
        batch = jax.tree.map(lambda x: x[0], batch)  # drop the per-device axis
        return step(ts, batch, epoch)

    sharded = _shard_map(
        device_step, mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded)


def make_dp_eval_step(config, mesh: Mesh, specs=None, pyramid_spec=None,
                      axis: str = "data"):
    step = make_eval_step(config, specs, pyramid_spec, axis_name=axis)

    def device_step(params, model_state, batch):
        batch = jax.tree.map(lambda x: x[0], batch)
        return step(params, model_state, batch)

    sharded = _shard_map(
        device_step, mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=P(),
    )
    return jax.jit(sharded)


def make_dp_extract_step(config, mesh: Mesh, specs=None, pyramid_spec=None,
                         axis: str = "data"):
    """Data-parallel feature extraction: N fragments in, N (features, scores,
    overflow) out, one fragment per device per call. Outputs keep the leading
    device axis so the host can unpack per-fragment results; ``overflow[i]``
    flags capacity truncation of fragment i (degraded outputs)."""
    step = make_extract_step(config, specs, pyramid_spec)

    def device_step(params, model_state, batch):
        batch = jax.tree.map(lambda x: x[0], batch)
        feats, scores, overflow = step(params, model_state, batch)
        return feats[None], scores[None], overflow[None]

    sharded = _shard_map(
        device_step, mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
    )
    return jax.jit(sharded)
