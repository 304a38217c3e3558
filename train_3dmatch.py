"""Training entry point.

Counterpart of the reference trainer script (reference:
training_3DMatch.py:18-145): builds config + model + datasets + loaders and
runs the epoch loop. Differences by design: the architecture list is
derived from config (not duplicated code), reproducibility is carried by
the dumped ``config.json`` + orbax snapshots (not source-file copies), and
the data pipeline is the thread-prefetch loader feeding the on-device
pyramid (no C++ collate workers).

Run ``python train_3dmatch.py --root /data/3DMatch`` for the real dataset,
``python train_3dmatch.py --synthetic`` for a hermetic smoke run, or
``python train_3dmatch.py --scan`` for simulated depth-scan pairs with
realistic (fused RGB-D) density at full 3DMatch-like point counts, or
``python train_3dmatch.py --corpus runs/corpus`` to train from a
pre-generated (and possibly still growing) disk corpus of scan scenes
with fresh per-visit augmentation (see tools/gen_corpus.py).
"""

import argparse
import sys

from d3feat_tpu.config import get_config
from d3feat_tpu.data.loader import PairLoader
from d3feat_tpu.train.trainer import Trainer


def make_loaders(config, synthetic: bool, scan: bool = False,
                 corpus: str | None = None):
    if corpus:
        from d3feat_tpu.data.synthetic import DiskScanPairDataset

        # per-visit augmentation makes every epoch fresh; the corpus dir
        # may keep growing under a concurrent tools/gen_corpus.py
        aug = dict(noise=config.augment_noise,
                   rotation=config.corpus_rotation,
                   augment_rotation=config.augment_rotation,
                   augment_translation=config.augment_translation)
        train_ds = DiskScanPairDataset(
            corpus, num_corr=config.num_node, seed=config.seed,
            role="train", **aug)
        val_ds = DiskScanPairDataset(
            corpus, num_corr=64, seed=config.seed + 7919,
            role="val", **aug)
    elif scan:
        from d3feat_tpu.data.synthetic import ScanPairDataset

        train_ds = ScanPairDataset(
            size=max(32, config.training_max_iter), num_corr=config.num_node,
            seed=config.seed)
        val_ds = ScanPairDataset(
            size=max(8, config.val_max_iter), num_corr=64,
            seed=config.seed + 7919)
    elif synthetic:
        from d3feat_tpu.data.synthetic import SyntheticPairDataset

        train_ds = SyntheticPairDataset(
            size=32, n_points=2000, num_corr=config.num_node, seed=config.seed
        )
        val_ds = SyntheticPairDataset(
            size=8, n_points=2000, num_corr=64, seed=config.seed + 1
        )
    else:
        from d3feat_tpu.data.threedmatch import ThreeDMatchPairDataset

        kwargs = dict(
            root=config.root, num_node=config.num_node,
            downsample=config.downsample, self_augment=config.self_augment,
            augment_noise=config.augment_noise, augment_axis=config.augment_axis,
            augment_rotation=config.augment_rotation,
            augment_translation=config.augment_translation,
        )
        train_ds = ThreeDMatchPairDataset(split="train", seed=config.seed, **kwargs)
        # validation uses num_node=64 in the reference (training_3DMatch.py:96)
        val_kwargs = dict(kwargs, num_node=64)
        val_ds = ThreeDMatchPairDataset(split="val", seed=config.seed + 1,
                                        **val_kwargs)

    mk = lambda ds, max_iter, seed: PairLoader(
        ds, point_capacity=config.caps.points[0],
        corr_capacity=config.caps.corr, num_devices=config.num_devices,
        num_workers=config.num_workers, max_iter=max_iter, seed=seed,
    )
    return (
        mk(train_ds, config.training_max_iter, config.seed),
        mk(val_ds, config.val_max_iter, config.seed + 1),
    )


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    synthetic = "--synthetic" in argv
    if synthetic:
        argv.remove("--synthetic")
    scan = "--scan" in argv
    if scan:
        argv.remove("--scan")
    corpus = None
    if "--corpus" in argv:
        i = argv.index("--corpus")
        corpus = argv[i + 1]
        del argv[i : i + 2]
    config = get_config(argv)
    train_loader, val_loader = make_loaders(config, synthetic, scan, corpus)
    trainer = Trainer(config, train_loader, val_loader)
    trainer.train()
    return 0


if __name__ == "__main__":
    sys.exit(main())
