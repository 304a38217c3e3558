"""Jitted training / validation / extraction steps.

The full per-iteration computation of the reference trainer
(reference: trainer.py:70-138) as one XLA program — *including* the
multi-scale pyramid build that the reference runs in C++ on the CPU inside
DataLoader workers (reference: datasets/dataloader.py:69-189). A step takes
the raw packed pair (points, features, lengths, correspondences) and does:

  pyramid -> KPFCNN forward -> correspondence gather -> descriptor loss
  (circle | contrastive) + detector loss -> grads -> non-finite skip
  (reference: trainer.py:104-111) -> SGD/Adam update at lr(epoch).

Anchor rows index cloud 0 directly; positive rows index cloud 1 and are
offset by ``lengths[0]`` exactly as the reference slices the stacked output
(reference: trainer.py:91-94).

When ``axis_name`` is given the step is shard_map-ready: gradients and
metrics are averaged across the data axis and the non-finite skip is a
global decision (any device non-finite => every device skips, keeping
parameters bitwise identical across the mesh).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from d3feat_tpu.losses.descriptor import circle_loss, contrastive_loss
from d3feat_tpu.losses.detector import det_loss
from d3feat_tpu.losses.regularizers import p2p_fitting_regularizer
from d3feat_tpu.models.kpfcnn import apply_kpfcnn, init_kpfcnn, make_kpfcnn_specs
from d3feat_tpu.ops.pyramid import build_pyramid, make_pyramid_spec
from d3feat_tpu.train.optim import learning_rate, make_optimizer


class TrainState(NamedTuple):
    params: Any
    model_state: Any
    opt_state: Any
    step: jax.Array  # [] int32 completed update count


class StepMetrics(NamedTuple):
    loss: jax.Array
    desc_loss: jax.Array
    det_loss: jax.Array
    accuracy: jax.Array
    d_pos: jax.Array
    d_neg: jax.Array
    lr: jax.Array
    skipped: jax.Array   # 1.0 when the update was dropped (non-finite grads)
    overflow: jax.Array  # 1.0 when a pyramid level overflowed its capacity


def init_train_state(key, config, optimizer=None):
    """Fresh parameters + optimizer state. Returns (TrainState, specs)."""
    params, model_state, specs = init_kpfcnn(key, config)
    optimizer = optimizer or make_optimizer(config)
    opt_state = optimizer.init(params)
    return (
        TrainState(params, model_state, opt_state, jnp.zeros((), jnp.int32)),
        specs,
    )


def _forward_losses(params, model_state, batch, config, specs, pyramid_spec,
                    *, train: bool):
    """Pyramid + forward + losses. Returns (loss, (metrics_tuple, new_state))."""
    from d3feat_tpu.ops.neighbors import permute_rows

    pyr = build_pyramid(batch["points"], batch["lengths"], spec=pyramid_spec)
    full = dict(pyr)
    sorted_space = bool(pyr.get("band"))  # band exported <=> sorted space
    if sorted_space:
        # the network runs entirely in the pyramid's key-sorted row order
        # (no per-block reorders); only the inputs/correspondences remap
        order0 = pyr["band"][0]["order"]
        inv0 = pyr["band"][0]["inv"]
        full["features"] = permute_rows(batch["features"], order0, inv0)
    else:
        full["features"] = batch["features"]

    compute_dtype = (
        jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    )
    out, new_state, auxes = apply_kpfcnn(
        params, model_state, full, config, specs,
        train=train, compute_dtype=compute_dtype,
    )

    lengths0 = batch["lengths"]
    anc_idx = batch["corr"][:, 0]
    pos_idx = batch["corr"][:, 1] + lengths0[0]
    if sorted_space:  # original stacked rows -> sorted rows
        anc_idx = jnp.take(inv0, anc_idx)
        pos_idx = jnp.take(inv0, pos_idx)
    valid = batch["corr_valid"]
    anc_f = jnp.take(out.features, anc_idx, axis=0)
    pos_f = jnp.take(out.features, pos_idx, axis=0)
    anc_s = jnp.take(out.scores, anc_idx, axis=0)
    pos_s = jnp.take(out.scores, pos_idx, axis=0)

    if config.desc_loss == "circle":
        desc = circle_loss(
            anc_f, pos_f, batch["dist_keypts"], valid,
            dist_type=config.dist_type, log_scale=config.log_scale,
            safe_radius=config.safe_radius, pos_margin=config.pos_margin,
            neg_margin=config.neg_margin,
        )
    else:
        desc = contrastive_loss(
            anc_f, pos_f, batch["dist_keypts"], valid,
            metric=config.dist_type, pos_margin=config.pos_margin,
            neg_margin=config.neg_margin, safe_radius=config.safe_radius,
        )
    dl = det_loss(desc.dists, anc_s, pos_s, valid)

    loss = config.desc_loss_weight * desc.loss + config.det_loss_weight * dl
    if auxes:
        loss = loss + p2p_fitting_regularizer(auxes, KP_extent=config.KP_extent)

    overflow = pyr["overflow"].astype(jnp.float32)
    metrics = (desc.loss, dl, desc.accuracy, desc.d_pos, desc.d_neg, overflow)
    return loss, (metrics, new_state)


def make_train_step(config, specs=None, pyramid_spec=None, optimizer=None,
                    axis_name: Optional[str] = None):
    """Build the jit-able train step: (TrainState, batch, epoch) -> (TrainState, StepMetrics).

    ``batch``: dict with points [C0,3], features [C0,F], lengths [2],
    corr [M,2], corr_valid [M], dist_keypts [M,M] — one fragment pair
    (per device, under shard_map).
    """
    specs = specs or make_kpfcnn_specs(config)
    pyramid_spec = pyramid_spec or make_pyramid_spec(config)
    optimizer = optimizer or make_optimizer(config)

    def train_step(ts: TrainState, batch, epoch):
        def loss_fn(params):
            return _forward_losses(
                params, ts.model_state, batch, config, specs, pyramid_spec,
                train=True,
            )

        (loss, (metrics, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(ts.params)
        desc_l, det_l, acc, d_pos, d_neg, overflow = metrics

        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss, desc_l, det_l, acc, d_pos, d_neg = jax.lax.pmean(
                (loss, desc_l, det_l, acc, d_pos, d_neg), axis_name
            )
            overflow = jax.lax.pmax(overflow, axis_name)

        # Non-finite gradient step skip (reference: trainer.py:104-111). With
        # pmean'd grads the flag is already identical on every device.
        leaves = jax.tree_util.tree_leaves(grads)
        finite = jnp.array(True)
        for g in leaves:
            finite &= jnp.all(jnp.isfinite(g))

        lr = learning_rate(config, epoch)
        updates, new_opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(
            ts.params, jax.tree.map(lambda u: -lr * u.astype(jnp.float32), updates)
        )

        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(finite, a, b), new, old
        )
        new_ts = TrainState(
            params=keep(new_params, ts.params),
            model_state=new_model_state,
            opt_state=keep(new_opt_state, ts.opt_state),
            step=ts.step + finite.astype(jnp.int32),
        )
        m = StepMetrics(
            loss=loss, desc_loss=desc_l, det_loss=det_l, accuracy=acc,
            d_pos=d_pos, d_neg=d_neg, lr=lr,
            skipped=1.0 - finite.astype(jnp.float32), overflow=overflow,
        )
        return new_ts, m

    return train_step


def make_eval_step(config, specs=None, pyramid_spec=None,
                   axis_name: Optional[str] = None):
    """Validation step: same losses, no grads, eval-mode detector head."""
    specs = specs or make_kpfcnn_specs(config)
    pyramid_spec = pyramid_spec or make_pyramid_spec(config)

    def eval_step(params, model_state, batch):
        loss, (metrics, _) = _forward_losses(
            params, model_state, batch, config, specs, pyramid_spec, train=False
        )
        desc_l, det_l, acc, d_pos, d_neg, overflow = metrics
        if axis_name is not None:
            loss, desc_l, det_l, acc, d_pos, d_neg = jax.lax.pmean(
                (loss, desc_l, det_l, acc, d_pos, d_neg), axis_name
            )
        return StepMetrics(
            loss=loss, desc_loss=desc_l, det_loss=det_l, accuracy=acc,
            d_pos=d_pos, d_neg=d_neg, lr=jnp.float32(0.0),
            skipped=jnp.float32(0.0), overflow=overflow,
        )

    return eval_step


def make_extract_step(config, specs=None, pyramid_spec=None,
                      num_clouds: int = 2):
    """Feature-extraction step for eval/serving: packed cloud(s) ->
    (descriptors, scores, overflow) with the eval-mode local-max score gate
    (reference: test.py:103-127 forward + slice). ``overflow`` is a scalar
    bool: any pyramid level exceeded its static point or neighbor capacity,
    i.e. neighbor lists were silently truncated and the outputs are degraded
    — callers must surface it (the trainer reports the same flag in its
    metrics).

    ``num_clouds`` > 2 batches that many independent fragments through one
    jitted program (fragments ride the cloud axis); scores use per-cloud
    max normalization, which coincides with the reference's global max for
    a single fragment.
    """
    specs = specs or make_kpfcnn_specs(config)
    pyramid_spec = pyramid_spec or make_pyramid_spec(config,
                                                     num_clouds=num_clouds)
    compute_dtype = (
        jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    )

    def extract_step(params, model_state, batch):
        from d3feat_tpu.ops.neighbors import permute_rows

        pyr = build_pyramid(batch["points"], batch["lengths"], spec=pyramid_spec)
        full = dict(pyr)
        sorted_space = bool(pyr.get("band"))  # band exported <=> sorted space
        if sorted_space:
            order0 = pyr["band"][0]["order"]
            inv0 = pyr["band"][0]["inv"]
            full["features"] = permute_rows(batch["features"], order0, inv0)
        else:
            full["features"] = batch["features"]
        out, _, _ = apply_kpfcnn(
            params, model_state, full, config, specs,
            train=False, compute_dtype=compute_dtype, per_cloud_norm=True,
        )
        feats, scores = out.features, out.scores
        if sorted_space:  # back to the caller's original row order
            feats = permute_rows(feats, inv0, order0)
            scores = permute_rows(scores, inv0, order0)
        return feats, scores, pyr["overflow"]

    return extract_step
