"""Registration recall: trained snapshot vs fresh init on a held-out scene.

The pretrained reference checkpoint is unreachable (no egress), so the
training-works proof is an ablation on the same task the reference
evaluates (test.py registration protocol): simulated depth-scan scenes
with exact GT poses, descriptors from (a) our TRAINED snapshot and
(b) the same architecture at init, through the identical registration
pipeline. Training must improve inlier ratio / recall over init.

Run after train_3dmatch.py --scan:
  python tools/recall_after_training.py --snapshot runs/scan_r2/scan_r2
Writes TRAIN_RECALL.json at the repo root.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU: per-fragment exact capacities would force a fresh TPU tunnel
# compile per fragment; the XLA-CPU path compiles in seconds
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from d3feat_tpu.config import D3FeatConfig, PyramidCaps  # noqa: E402
from d3feat_tpu.data.pack import pack_single  # noqa: E402
from d3feat_tpu.eval.registration import (  # noqa: E402
    FragmentFeatures,
    register_scene,
)
from d3feat_tpu.models import apply_kpfcnn, make_kpfcnn_specs  # noqa: E402
from d3feat_tpu.ops import build_pyramid, make_pyramid_spec  # noqa: E402
from d3feat_tpu.train.checkpoint import SnapshotManager  # noqa: E402
from d3feat_tpu.train.step import init_train_state  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", type=str, default="runs/scan_r2/scan_r2")
    ap.add_argument("--name", type=str, default="model_best_loss")
    ap.add_argument("--fragments", type=int, default=8)
    ap.add_argument("--num_points", type=int, default=250)
    ap.add_argument("--seed", type=int, default=424242)  # held-out scene
    ap.add_argument("--frame", type=str, default="axis",
                    choices=["axis", "so3"],
                    help="per-fragment frame distribution (see make_scene)")
    ap.add_argument("--scenes", type=int, default=1,
                    help="number of held-out scenes (seed, seed+1, ...)")
    ap.add_argument("--warp", type=float, default=0.0,
                    help="domain-warp amplitude; match the training corpus "
                         "(gen_corpus --warp)")
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from ab_recall import make_scene

    with open(os.path.join(args.snapshot, "config.json")) as f:
        cfg = D3FeatConfig.from_dict(json.load(f))

    ts, specs = init_train_state(jax.random.key(cfg.seed), cfg)
    mgr = SnapshotManager(args.snapshot)
    trained, meta = mgr.restore(args.name, ts)
    print("loaded", args.name, "meta:", meta)

    scenes = []
    for s in range(args.scenes):
        rng = np.random.default_rng(args.seed + s)
        frags, poses, overlaps = make_scene(rng, args.fragments, (120, 90),
                                            frame=args.frame, warp=args.warp)
        print(f"scene {s}: {len(frags)} fragments "
              f"({[len(f) for f in frags]}), {len(poses)} gt pairs")
        scenes.append((frags, poses))

    results = {}
    agg = {}
    for tag, params, model_state in (
        ("init", ts.params, ts.model_state),
        ("trained", trained.params, trained.model_state),
    ):
      recalls, ratios, acc_all, gt_total = [], [], [], 0
      for s, (frags, poses) in enumerate(scenes):
        feats = FragmentFeatures()
        for i, pts in enumerate(frags):
            n = len(pts)
            c = D3FeatConfig.from_dict(cfg.to_dict())
            caps = [n]
            m = n
            for _ in range(c.num_layers - 1):
                m = max(64, m // 2)
                caps.append(m)
            c.caps = PyramidCaps(points=tuple(caps),
                                 neighbors=(40,) * c.num_layers, corr=64)
            c.query_tile = 256
            batch = pack_single(pts, np.ones((n, 1), np.float32),
                                point_capacity=n)
            spec = make_pyramid_spec(c, num_clouds=2)
            pyr = dict(build_pyramid(jnp.asarray(batch["points"]),
                                     jnp.asarray(batch["lengths"]),
                                     spec=spec))
            if bool(pyr["overflow"]):
                print(f"  fragment {i}: overflow (caps {caps}) — skipping "
                      "run", file=sys.stderr)
            if pyr.get("band"):
                order0 = pyr["band"][0]["order"]
                pyr["features"] = jnp.asarray(batch["features"])[order0]
            else:
                pyr["features"] = jnp.asarray(batch["features"])
            out, _, _ = apply_kpfcnn(params, model_state, pyr, c,
                                     specs, train=False)
            feats_i = np.asarray(out.features)
            scores_i = np.asarray(out.scores)
            if pyr.get("band"):
                inv0 = np.asarray(pyr["band"][0]["inv"])
                feats_i = feats_i[inv0]
                scores_i = scores_i[inv0]
            feats.add(i, pts, feats_i[:n], scores_i[:n, 0])
        res = register_scene(feats, poses, scene=f"after-train-{tag}-{s}",
                             num_points=args.num_points)
        # descriptor accuracy on exact GT correspondences (the trainer's
        # accuracy semantic, reference trainer.py:140-195): anchor matched
        # to its true counterpart iff the positive descriptor is its 1-NN
        # among all sampled candidates of the other fragment
        from scipy.spatial import cKDTree

        accs = []
        rngm = np.random.default_rng(7)
        for key, pose in poses.items():
            i1, i2 = (int(v) for v in key.split("_"))
            p1 = frags[i1] @ pose[:3, :3].T + pose[:3, 3]
            tree = cKDTree(frags[i2])
            dist, j = tree.query(p1, k=1, distance_upper_bound=0.0375)
            ii = np.nonzero(np.isfinite(dist))[0]
            if len(ii) < 16:
                continue
            sel = rngm.choice(len(ii), min(256, len(ii)), replace=False)
            a = feats.descriptors[i1][ii[sel]]
            b_all = feats.descriptors[i2]
            pos_idx = j[ii[sel]]
            d = np.linalg.norm(a[:, None] - b_all[pos_idx][None], axis=-1)
            # 1-NN among the sampled positives (matched-pair accuracy)
            accs.append(float(np.mean(np.argmin(d, axis=1)
                                      == np.arange(len(sel)))))
        recalls.append(res.recall)
        ratios.append(res.avg_inlier_ratio)
        acc_all.extend(accs)
        gt_total += len(poses)
        print(f"  {tag} scene {s}: recall {res.recall:.1f} "
              f"inlier_ratio {res.avg_inlier_ratio:.4f}")
      results[tag] = {
          "recall": float(np.mean(recalls)),
          "avg_inlier_ratio": float(np.mean(ratios)),
          "gt_match_accuracy": float(np.mean(acc_all)) if acc_all else 0.0,
      }
      agg[tag] = {"per_scene_recall": recalls}
      print(tag, results[tag])

    out = {
        "gt_pairs": gt_total,
        "frame": args.frame,
        "per_scene_recall": agg,
        "snapshot": os.path.join(args.snapshot, args.name),
        "epochs_meta": meta,
        **{f"{k}_{t}": v for t, r in results.items() for k, v in r.items()},
        "inlier_ratio_gain":
            results["trained"]["avg_inlier_ratio"]
            - results["init"]["avg_inlier_ratio"],
        "gt_match_accuracy_gain":
            results["trained"]["gt_match_accuracy"]
            - results["init"]["gt_match_accuracy"],
    }
    print(json.dumps(out, indent=2, default=str))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "TRAIN_RECALL.json"), "w") as f:
        json.dump(out, f, indent=2, default=str)
    return 0


if __name__ == "__main__":
    sys.exit(main())
