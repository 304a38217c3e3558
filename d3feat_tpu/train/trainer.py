"""Epoch-loop trainer.

Counterpart of the reference Trainer (reference: trainer.py:9-228) with the
same control flow — per-epoch train + validate, best-loss/best-acc
snapshotting, periodic snapshots, ExponentialLR stepped per
``scheduler_interval`` epochs, non-finite-gradient step skipping — but with
the whole per-iteration computation (pyramid + forward + losses + update)
in one jitted XLA program, optionally shard_map'd over a data-parallel
device mesh (one fragment pair per device per step; the reference is
single-device, trainer.py:23).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from d3feat_tpu.models.kpfcnn import make_kpfcnn_specs
from d3feat_tpu.ops.pyramid import make_pyramid_spec
from d3feat_tpu.parallel.data_parallel import (
    make_dp_eval_step,
    make_dp_train_step,
)
from d3feat_tpu.parallel.mesh import batch_sharding, make_mesh
from d3feat_tpu.train.checkpoint import BEST_ACC, BEST_LOSS, SnapshotManager
from d3feat_tpu.train.logging_utils import MetricsLogger
from d3feat_tpu.train.optim import make_optimizer
from d3feat_tpu.train.step import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_train_step,
)
from d3feat_tpu.utils.timer import AverageMeter, Timer

_METRIC_KEYS = ("loss", "desc_loss", "det_loss", "accuracy", "d_pos", "d_neg")


class Trainer:
    """Drives training of KPFCNN on fragment-pair loaders.

    Args:
      config: D3FeatConfig.
      train_loader / val_loader: iterables of stacked batch dicts (leading
        axis = config.num_devices), e.g. :class:`d3feat_tpu.data.loader.PairLoader`.
    """

    def __init__(self, config, train_loader, val_loader=None,
                 snapshot_dir: Optional[str] = None, verbose: Optional[bool] = None):
        self.config = config
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.verbose = config.verbose if verbose is None else verbose

        self.specs = make_kpfcnn_specs(config)
        self.pyramid_spec = make_pyramid_spec(config)
        self.optimizer = make_optimizer(config)
        self.state, _ = init_train_state(
            jax.random.key(config.seed), config, self.optimizer
        )

        if config.num_devices > 1:
            self.mesh = make_mesh(config.num_devices, axis=config.data_axis)
            self._train_step = make_dp_train_step(
                config, self.mesh, self.specs, self.pyramid_spec,
                self.optimizer, axis=config.data_axis,
            )
            self._eval_step = make_dp_eval_step(
                config, self.mesh, self.specs, self.pyramid_spec,
                axis=config.data_axis,
            )
            self._batch_sharding = batch_sharding(self.mesh, config.data_axis)
        else:
            self.mesh = None
            step = make_train_step(config, self.specs, self.pyramid_spec,
                                   self.optimizer)
            estep = make_eval_step(config, self.specs, self.pyramid_spec)

            def _single_train(ts, batch, epoch):
                b = jax.tree.map(lambda x: x[0], batch)
                return step(ts, b, epoch)

            def _single_eval(params, mstate, batch):
                b = jax.tree.map(lambda x: x[0], batch)
                return estep(params, mstate, b)

            self._train_step = jax.jit(_single_train)
            self._eval_step = jax.jit(_single_eval)
            self._batch_sharding = None

        snapshot_dir = snapshot_dir or os.path.join(
            config.snapshot_root, config.experiment_id
        )
        self.snapshots = SnapshotManager(snapshot_dir, config)
        self.logger = MetricsLogger(snapshot_dir)

        self.start_epoch = 0
        self.best_loss = float("inf")
        self.best_acc = 0.0
        self.global_iter = 0
        if config.pretrain:
            self._load_pretrain(config.pretrain)

    # ------------------------------------------------------------------
    def _device_put(self, batch: Dict[str, np.ndarray]):
        if self._batch_sharding is not None:
            return {
                k: jax.device_put(v, self._batch_sharding)
                for k, v in batch.items()
            }
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def _load_pretrain(self, name: str) -> None:
        """Resume from a snapshot name inside the snapshot dir, or a path.

        A ``.npz`` path warm-starts from a portable params-only artifact
        (compat/portable.py): params + model_state are restored, the
        optimizer state stays fresh (momentum rebuilds within ~1/(1-beta)
        steps) and the epoch counter / best-acc come from the artifact's
        meta. This is the reset-recovery path — Orbax snapshots live on
        the wipeable disk, the npz is committed to git.
        """
        if name.endswith(".npz"):
            from d3feat_tpu.compat.portable import import_npz

            params, mstate, meta = import_npz(
                name, self.state.params, self.state.model_state)
            self.state = self.state._replace(
                params=params, model_state=mstate)
            self.start_epoch = int(meta.get("epoch", 0))
            self.best_loss = float(meta.get("best_loss", float("inf")))
            self.best_acc = float(meta.get("best_acc", 0.0))
            self.global_iter = self.start_epoch * min(
                len(self.train_loader), self.config.training_max_iter)
            if self.verbose:
                print(f"[trainer] warm-started {name!r} at epoch "
                      f"{self.start_epoch} (best_acc {self.best_acc:.2f}%)")
            return
        mgr = self.snapshots
        if os.path.isabs(name) or os.sep in name:
            mgr = SnapshotManager(os.path.dirname(name))
            name = os.path.basename(name)
        self.state, meta = mgr.restore(name, self.state)
        self.start_epoch = int(meta["epoch"])
        self.best_loss = float(meta["best_loss"])
        self.best_acc = float(meta["best_acc"])
        # keep the train/ step axis monotone across resumes (epochs run
        # exactly min(len(loader), training_max_iter) steps unless the
        # loader is exhausted early, which the corpus loader never is)
        self.global_iter = self.start_epoch * min(
            len(self.train_loader), self.config.training_max_iter
        )
        if self.verbose:
            print(f"[trainer] resumed {name!r} at epoch {self.start_epoch}")

    # ------------------------------------------------------------------
    def train(self) -> TrainState:
        """Full schedule (reference: trainer.py:39-68)."""
        for epoch in range(self.start_epoch, self.config.max_epoch):
            self.train_epoch(epoch)
            if self.val_loader is not None:
                res = self.evaluate(epoch)
                if res["loss"] < self.best_loss:
                    self.best_loss = res["loss"]
                    self._snapshot(BEST_LOSS, epoch)
                if res["accuracy"] > self.best_acc:
                    self.best_acc = res["accuracy"]
                    self._snapshot(BEST_ACC, epoch)
                    self._autoexport(epoch)
            if (epoch + 1) % self.config.snapshot_interval == 0:
                self._snapshot(f"snapshot_epoch_{epoch + 1}", epoch)
        self._snapshot("model_final", self.config.max_epoch - 1)
        return self.state

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.config
        meters = {k: AverageMeter() for k in _METRIC_KEYS + ("skipped", "overflow")}
        data_timer, step_timer = Timer(), Timer()
        epoch_arr = jnp.int32(epoch)

        # Metrics stay on device until drained: a float() per step would
        # force a host<->device roundtrip every iteration (the TPU rides a
        # tunnel here — each sync costs milliseconds and breaks dispatch
        # pipelining). Drain every _SYNC steps and at epoch end.
        # INVARIANT: every exit from this loop body must be followed by a
        # drain() before `meters` is read — the final drain() below covers
        # the natural end and the StopIteration break; any new early exit
        # (return/break) added here must call drain() first or up to
        # _SYNC-1 steps of metrics are silently dropped.
        _SYNC = 32
        pending = []

        def drain():
            for m in jax.device_get(pending):
                for k in _METRIC_KEYS:
                    meters[k].update(float(getattr(m, k)))
                meters["skipped"].update(float(m.skipped))
                meters["overflow"].update(float(m.overflow))
            pending.clear()

        it = iter(self.train_loader)
        for i in range(min(len(self.train_loader), cfg.training_max_iter)):
            data_timer.tic()
            try:
                batch = next(it)
            except StopIteration:
                break
            batch = self._device_put(batch)
            data_timer.toc()

            step_timer.tic()
            self.state, m = self._train_step(self.state, batch, epoch_arr)
            pending.append(m)
            if len(pending) >= _SYNC or self.global_iter % 100 == 99:
                drain()  # forces completion; keeps timing honest-on-average
            step_timer.toc()
            self.global_iter += 1

            if self.global_iter % 100 == 0:
                self.logger.log(
                    {
                        "Desc_Loss": meters["desc_loss"].avg,
                        "Det_Loss": meters["det_loss"].avg,
                        "D_pos": meters["d_pos"].avg,
                        "D_neg": meters["d_neg"].avg,
                        "Accuracy": meters["accuracy"].avg,
                        "lr": float(m.lr),
                        # nonzero => static capacities too small for this
                        # data: recalibrate with data/calibrate.py
                        "Overflow": meters["overflow"].avg,
                    },
                    self.global_iter, prefix="train/",
                )
                if self.verbose:
                    print(
                        f"epoch {epoch} iter {i}: loss {meters['loss'].avg:.4f} "
                        f"acc {meters['accuracy'].avg:.2f}% "
                        f"data {data_timer.avg * 1e3:.1f}ms "
                        f"step {step_timer.avg * 1e3:.1f}ms"
                    )
        drain()  # up to _SYNC-1 steps still pending at loop exit
        return {k: m.avg for k, m in meters.items()}

    def evaluate(self, epoch: int) -> Dict[str, float]:
        cfg = self.config
        meters = {k: AverageMeter() for k in _METRIC_KEYS}
        it = iter(self.val_loader)
        for _ in range(min(len(self.val_loader), cfg.val_max_iter)):
            try:
                batch = next(it)
            except StopIteration:
                break
            batch = self._device_put(batch)
            m = self._eval_step(self.state.params, self.state.model_state, batch)
            for k in _METRIC_KEYS:
                meters[k].update(float(getattr(m, k)))
        res = {k: m.avg for k, m in meters.items()}
        self.logger.log(
            {"Loss": res["loss"], "Accuracy": res["accuracy"],
             "Desc_Loss": res["desc_loss"], "Det_Loss": res["det_loss"]},
            epoch, prefix="val/",
        )
        if self.verbose:
            print(f"[val] epoch {epoch}: loss {res['loss']:.4f} "
                  f"acc {res['accuracy']:.2f}%")
        return res

    def _autoexport(self, epoch: int) -> None:
        """Portable npz of the new best-acc params (config.autoexport).

        Written atomically (tmp + rename) so a reset mid-write can't
        corrupt the artifact; failure to export never kills the run.
        """
        path = self.config.autoexport
        if not path:
            return
        try:
            from d3feat_tpu.compat.portable import export_npz

            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            tmp = path + ".tmp.npz"
            export_npz(
                tmp, self.state.params, self.state.model_state,
                meta={"epoch": epoch + 1, "best_loss": self.best_loss,
                      "best_acc": self.best_acc,
                      "config": self.config.to_dict()},
            )
            os.replace(tmp, path)
            if self.verbose:
                print(f"[trainer] autoexport {path!r} @ epoch {epoch} "
                      f"(best_acc {self.best_acc:.2f}%)")
        except Exception as e:  # noqa: BLE001 — never take down training
            print(f"[trainer] autoexport FAILED: {e!r}")

    def _snapshot(self, name: str, epoch: int) -> None:
        self.snapshots.save(
            name, self.state, epoch=epoch + 1,
            best_loss=self.best_loss, best_acc=self.best_acc,
        )
        if self.verbose:
            print(f"[trainer] snapshot {name!r} @ epoch {epoch}")
