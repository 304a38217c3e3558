"""Final held-out registration recall through the SERVING path.

Unlike tools/recall_after_training.py (per-fragment exact capacities,
pinned to CPU), this drives the bucketed ``FeatureExtractor`` — the same
code path bench.py serves with — so it runs on whatever backend JAX
resolves (the real TPU chip when it is free) and doubles as an end-to-end
proof of the trained snapshot on the production extraction path:

  held-out warped scenes (exact GT poses, seeds disjoint from the
  training corpus) -> bucketed pyramid + KPFCNN forward on device ->
  registration protocol (top-k keypoints, mutual-NN, inlier ratio at
  10 cm, recall at 5%) for (a) the trained snapshot and (b) the same
  architecture at init.  (protocol: reference test.py:20-82)

Run after training (directory snapshot or portable .npz artifact):
  python tools/final_recall.py --snapshot artifacts/model_best_acc_r5.npz \
      --warp 2.0 --scenes 4 --fragments 12
Writes TRAIN_RECALL_r05.json (--out) at the repo root.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", type=str, default="runs/r4/corpus4w")
    ap.add_argument("--name", type=str, default="model_best_acc")
    ap.add_argument("--fragments", type=int, default=12)
    ap.add_argument("--num_points", type=int, default=250)
    ap.add_argument("--seed", type=int, default=424242)  # held-out scenes
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--warp", type=float, default=2.0,
                    help="domain-warp amplitude; match the training corpus")
    ap.add_argument("--frame", type=str, default="axis",
                    choices=["axis", "so3"])
    ap.add_argument("--batch_fragments", type=int, default=2)
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (default: let JAX resolve)")
    ap.add_argument("--out", type=str, default="TRAIN_RECALL_r05.json")
    ap.add_argument("--scene_cache", type=str, default=None,
                    help="directory of pre-generated scenes (scene_<i>.npz "
                    "written on first run): scene generation is minutes of "
                    "host CPU per scene, so the chip phase loads them")
    ap.add_argument("--skip_init", action="store_true",
                    help="skip the init-weights control pass (its numbers "
                    "are protocol-stable: recall 0.0 on every recorded "
                    "probe) — halves mid-training ladder probe cost")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from d3feat_tpu.config import D3FeatConfig
    from d3feat_tpu.eval.extract import FeatureExtractor
    from d3feat_tpu.eval.registration import FragmentFeatures, register_scene
    from d3feat_tpu.train.step import init_train_state

    if args.snapshot.endswith(".npz"):
        # portable params-only artifact (tools/export_weights.py) — the
        # trained model committed in artifacts/ restores without runs/
        from d3feat_tpu.compat.portable import import_npz

        import numpy as _np

        with _np.load(args.snapshot, allow_pickle=False) as z:
            meta0 = json.loads(str(z["__meta__"]))
        cfg = D3FeatConfig.from_dict(meta0["config"])
        ts, _specs = init_train_state(jax.random.key(cfg.seed), cfg)
        p, s, meta = import_npz(args.snapshot, ts.params, ts.model_state)
        trained = ts._replace(params=p, model_state=s)
        meta.pop("config", None)
    else:
        from d3feat_tpu.train.checkpoint import SnapshotManager

        with open(os.path.join(args.snapshot, "config.json")) as f:
            cfg = D3FeatConfig.from_dict(json.load(f))

        ts, _specs = init_train_state(jax.random.key(cfg.seed), cfg)
        mgr = SnapshotManager(args.snapshot)
        trained, meta = mgr.restore(args.name, ts)
    print("loaded", args.snapshot, args.name, "meta:", meta, "backend:",
          jax.default_backend(), flush=True)

    from scene_cache import get_scene

    scenes = []
    for s in range(args.scenes):
        frags, poses = get_scene(args.seed + s, args.fragments, args.frame,
                                 args.warp, cache_dir=args.scene_cache)
        print(f"scene {s}: {len(frags)} fragments "
              f"({[len(f) for f in frags]}), {len(poses)} gt pairs",
              flush=True)
        scenes.append((frags, poses))

    results, per_scene = {}, {}
    gt_total = 0
    passes = [("init", ts.params, ts.model_state),
              ("trained", trained.params, trained.model_state)]
    if args.skip_init:
        results["init"] = {"recall": None, "avg_inlier_ratio": None,
                           "inlier_ratio_pctiles": {}}
        per_scene["init"] = {"per_scene_recall": []}
        passes = passes[1:]
    for tag, params, model_state in passes:
        ex = FeatureExtractor(cfg, params, model_state,
                              batch_fragments=args.batch_fragments,
                              on_overflow="warn")
        recalls, ratios, pair_ratios = [], [], []
        pair_detail = {}
        for s, (frags, poses) in enumerate(scenes):
            feats = FragmentFeatures()
            for i, (desc, sc) in enumerate(ex.extract_many(frags)):
                feats.add(i, frags[i], desc, sc)
            res = register_scene(feats, poses, scene=f"final-{tag}-{s}",
                                 num_points=args.num_points)
            recalls.append(res.recall)
            ratios.append(res.avg_inlier_ratio)
            pair_ratios.extend((res.pair_ratios or {}).values())
            pair_detail[f"scene{s}"] = {
                k: round(v, 5) for k, v in (res.pair_ratios or {}).items()
            }
            if tag == "trained":
                gt_total += len(poses)
            print(f"  {tag} scene {s}: recall {res.recall:.1f} "
                  f"inlier_ratio {res.avg_inlier_ratio:.4f}", flush=True)
        pr = np.asarray(pair_ratios, np.float64)
        results[tag] = {
            "recall": float(np.mean(recalls)),
            "avg_inlier_ratio": float(np.mean(ratios)),
            "inlier_ratio_pctiles": {
                str(p): float(np.percentile(pr, p)) if pr.size else 0.0
                for p in (10, 25, 50, 75, 90)
            },
        }
        per_scene[tag] = {"per_scene_recall": recalls}
        if tag == "trained":
            # per-pair inlier ratios: the distribution behind the recall
            # number (which pairs clear 5%), keyed scene -> "i_j"
            results[tag]["pair_inlier_ratios"] = pair_detail
        print(tag, {k: v for k, v in results[tag].items()
                    if k != "pair_inlier_ratios"}, flush=True)

    out = {
        "protocol": "reference test.py:20-82 (top-k, mutual-NN, "
                    "inlier>0.05 at 0.10 m)",
        "path": "serving FeatureExtractor (bucketed), backend "
                + jax.default_backend(),
        "gt_pairs": gt_total,
        "frame": args.frame,
        "warp": args.warp,
        "num_points": args.num_points,
        "snapshot": (args.snapshot if args.snapshot.endswith(".npz")
                     else os.path.join(args.snapshot, args.name)),
        "epochs_meta": meta,
        "per_scene_recall": per_scene,
        "fragment_sizes": {f"scene{s}": [len(f) for f in frags]
                           for s, (frags, _) in enumerate(scenes)},
        **{f"{k}_{t}": v for t, r in results.items() for k, v in r.items()},
        "recall_gain":
            (results["trained"]["recall"] - results["init"]["recall"]
             if not args.skip_init else None),
        "inlier_ratio_gain":
            (results["trained"]["avg_inlier_ratio"]
             - results["init"]["avg_inlier_ratio"]
             if not args.skip_init else None),
    }
    print(json.dumps(out, indent=2, default=str))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, args.out), "w") as f:
        json.dump(out, f, indent=2, default=str)
    return 0


if __name__ == "__main__":
    sys.exit(main())
