"""Host-side pyramid-cap calibration for a disk corpus.

The on-device `d3feat_tpu.data.calibrate.calibrate_caps` is the canonical
path, but brute-force `count_in_radius` over 32k-point clouds is hopeless
on this single-core host and the chip is frequently busy training — this
tool reproduces the same statistics (80th-percentile neighbor counts per
level, reference: datasets/dataloader.py:191-223; max subsampled point
count + headroom, rounded up to 256) with a cKDTree and the numpy voxel
oracle, straight from corpus .npz scenes.

Run: python tools/calibrate_corpus.py runs/corpus3 [--scenes 32]
"""
import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--scenes", type=int, default=32)
    ap.add_argument("--num_layers", type=int, default=5)
    ap.add_argument("--first_subsampling_dl", type=float, default=0.03)
    ap.add_argument("--conv_radius", type=float, default=2.5)
    ap.add_argument("--keep_ratio", type=float, default=0.8)
    ap.add_argument("--headroom", type=float, default=1.15)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from scipy.spatial import cKDTree

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from tests.reference_ops import np_batch_voxel_subsample

    files = sorted(glob.glob(os.path.join(args.root, "scene_*.npz")))
    if not files:
        print(f"no scenes under {args.root}")
        return 1
    rng = np.random.default_rng(args.seed)
    files = [files[i] for i in rng.choice(
        len(files), min(args.scenes, len(files)), replace=False)]

    L = args.num_layers
    r0 = args.first_subsampling_dl * args.conv_radius
    hist = [[] for _ in range(L)]
    max_pts = [0] * L

    for path in files:
        with np.load(path) as z:
            w0, w1 = z["w0"], z["w1"]
        pts = np.concatenate([w0, w1]).astype(np.float32)
        lengths = np.array([len(w0), len(w1)])
        for l in range(L):
            r = r0 * (2.0 ** l)
            max_pts[l] = max(max_pts[l], int(lengths.sum()))
            off = 0
            for n in lengths:
                cloud = pts[off:off + n]
                tree = cKDTree(cloud)
                # sample queries: counting all points is O(N * log N * k)
                # and slow at L0; 2048 queries give a stable 80th pctile
                q = cloud if n <= 2048 else cloud[rng.choice(
                    n, 2048, replace=False)]
                cnt = tree.query_ball_point(q, r, return_length=True)
                hist[l].append(np.asarray(cnt))
                off += n
            if l + 1 < L:
                pts, lengths = np_batch_voxel_subsample(
                    pts, lengths, 2.0 * r / args.conv_radius)
                pts = pts.astype(np.float32)

    neighbors, points = [], []
    for l in range(L):
        counts = np.concatenate(hist[l])
        neighbors.append(int(np.quantile(
            counts, args.keep_ratio, method="higher")))
        cap = int(max_pts[l] * args.headroom)
        points.append(int(-(-cap // 256) * 256))
    print({"points": points, "neighbors": neighbors,
           "scenes": len(files)})
    return 0


if __name__ == "__main__":
    sys.exit(main())
