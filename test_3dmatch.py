"""Evaluation entry point: feature generation + geometric-registration recall.

Counterpart of the reference test driver (reference: test.py:131-234) with
the same CLI surface: ``--chosen_snapshot`` picks a snapshot directory
(ours: containing config.json + orbax snapshots; or a reference ``.pth``
via --torch_checkpoint), ``--generate_features`` extracts and saves
keypts/descriptors/scores per fragment, then per-scene feature-match
recall runs against the 3DMatch ``gt.log`` files.

``--synthetic`` runs the whole pipeline hermetically on generated
fragments with exact ground-truth poses (no dataset download needed).
"""

import argparse
import json
import os
import sys

import numpy as np
import jax


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="d3feat_tpu evaluation")
    p.add_argument("--chosen_snapshot", type=str, default="",
                   help="snapshot directory (config.json + orbax states)")
    p.add_argument("--torch_checkpoint", type=str, default="",
                   help="reference .pth checkpoint to import via compat/")
    p.add_argument("--snapshot_name", type=str, default="model_best_acc")
    p.add_argument("--inlier_ratio_threshold", default=0.05, type=float)
    p.add_argument("--distance_threshold", default=0.10, type=float)
    p.add_argument("--random_points", default=False, action="store_true")
    p.add_argument("--num_points", default=250, type=int)
    p.add_argument("--generate_features", default=False, action="store_true")
    p.add_argument("--root", type=str, default="",
                   help="3DMatch root (overrides snapshot config)")
    p.add_argument("--gt_root", type=str,
                   default="geometric_registration/gt_result")
    p.add_argument("--save_path", type=str, default="")
    p.add_argument("--synthetic", default=False, action="store_true")
    return p.parse_args(argv)


def load_model(args):
    from d3feat_tpu.config import D3FeatConfig

    cfg_path = os.path.join(args.chosen_snapshot, "config.json")
    if os.path.exists(cfg_path):
        config = D3FeatConfig.from_json(cfg_path)
    else:
        config = D3FeatConfig()
    if args.root:
        config.root = args.root

    if args.torch_checkpoint:
        from d3feat_tpu.compat.torch_import import load_torch_checkpoint

        params, model_state, _ = load_torch_checkpoint(
            args.torch_checkpoint, config
        )
    elif args.chosen_snapshot:
        from d3feat_tpu.train.checkpoint import SnapshotManager
        from d3feat_tpu.train.step import init_train_state

        ts, _ = init_train_state(jax.random.key(config.seed), config)
        mgr = SnapshotManager(args.chosen_snapshot)
        ts, _ = mgr.restore(args.snapshot_name, ts)
        params, model_state = ts.params, ts.model_state
    else:
        from d3feat_tpu.train.step import init_train_state

        ts, _ = init_train_state(jax.random.key(config.seed), config)
        params, model_state = ts.params, ts.model_state
    return config, params, model_state


def synthetic_eval(args, config, params, model_state):
    """Hermetic: two synthetic scenes of transformed fragment views."""
    from d3feat_tpu.data.synthetic import synthetic_fragment
    from d3feat_tpu.eval.extract import FeatureExtractor
    from d3feat_tpu.eval.registration import FragmentFeatures, register_scene

    from d3feat_tpu.data.threedmatch import voxel_downsample

    rng = np.random.default_rng(0)
    extractor = FeatureExtractor(config, params, model_state)
    feats = FragmentFeatures()
    poses = {}
    # the protocol always voxel-downsamples fragments before the network
    # (reference: datasets/ThreeDMatch.py:190-191) — the pyramid's bounded
    # voxel-occupancy invariant depends on this input spacing
    base = voxel_downsample(
        synthetic_fragment(rng, 4000, extent=3.0),
        max(config.downsample, config.first_subsampling_dl),
    )
    frames = []
    for f in range(3):
        rot = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        if np.linalg.det(rot) < 0:
            rot[:, 0] *= -1
        t = rng.normal(size=3) * 0.3
        frames.append((rot, t))
        local = (base - t) @ rot
        desc, scores = extractor.extract(local.astype(np.float32))
        feats.add(f, local, desc, scores)
    for i in range(3):
        for j in range(i + 1, 3):
            ri, ti = frames[i]
            rj, tj = frames[j]
            gt = np.eye(4)
            gt[:3, :3] = ri.T @ rj
            gt[:3, 3] = (tj - ti) @ ri
            poses[f"{i}_{j}"] = gt
    res = register_scene(
        feats, poses, scene="synthetic", num_points=args.num_points,
        inlier_ratio_threshold=args.inlier_ratio_threshold,
        distance_threshold=args.distance_threshold,
        random_points=args.random_points,
    )
    print(json.dumps({
        "scene": res.scene, "recall": res.recall,
        "avg_inlier_ratio": res.avg_inlier_ratio,
        "avg_inlier_num": res.avg_inlier_num,
    }))
    return 0


def main(argv=None):
    args = parse_args(argv)
    config, params, model_state = load_model(args)

    if args.synthetic:
        return synthetic_eval(args, config, params, model_state)

    from d3feat_tpu.data.threedmatch import ThreeDMatchTestset
    from d3feat_tpu.eval.extract import FeatureExtractor, generate_features
    from d3feat_tpu.eval.registration import FragmentFeatures, evaluate_scenes

    save_path = args.save_path or os.path.join(
        "geometric_registration",
        os.path.basename(args.chosen_snapshot.rstrip("/")) or "d3feat_tpu",
    )
    testset = ThreeDMatchTestset(config.root, downsample=config.downsample)

    if args.generate_features:
        extractor = FeatureExtractor(config, params, model_state)
        scene_features = generate_features(
            extractor, testset, save_path=save_path, verbose=True
        )
    else:
        scene_features = {
            scene: FragmentFeatures.load(save_path, scene)
            for scene in testset.scene_list
        }

    results, summary = evaluate_scenes(
        scene_features, args.gt_root,
        num_points=args.num_points,
        inlier_ratio_threshold=args.inlier_ratio_threshold,
        distance_threshold=args.distance_threshold,
        random_points=args.random_points,
    )
    for r in results:
        print(f"{r.scene}: Recall={r.recall:.2f}%, "
              f"inlier ratio={r.avg_inlier_ratio*100:.2f}%, "
              f"inlier num={r.avg_inlier_num:.2f}")
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
