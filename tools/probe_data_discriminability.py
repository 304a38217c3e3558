"""Measure the intrinsic discriminability of corpus correspondences.

For each scene: build a cheap rotation-invariant signature of the local
patch around every correspondence endpoint (sorted covariance eigenvalues +
a radial distance histogram at two scales), then check how often anchor i's
nearest signature among {positive_j} is the true positive_i (the trainer's
accuracy semantic, with a handcrafted descriptor in place of the network).

If this 1-NN accuracy is near chance, no descriptor network can separate the
positives from the negatives on this data — the geometry classes collide
(axis-aligned planes/edges/corners all look alike) and descriptor training
HAS to stall. Compares two corpus directories (e.g. the old boxes-only
scenes vs the enriched rotbox/sphere/cylinder scenes).

Usage: python tools/probe_data_discriminability.py runs/corpus runs/corpus2
"""
import glob
import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def patch_signature(pts, tree, centers, radii=(0.15, 0.3), nbins=6):
    """[M, D] rotation-invariant local signatures at ``centers``."""
    sigs = []
    for r in radii:
        lists = tree.query_ball_point(centers, r)
        feats = np.zeros((len(centers), 3 + nbins), np.float32)
        for k, nb in enumerate(lists):
            if len(nb) < 4:
                continue
            p = pts[nb] - centers[k]
            ev = np.linalg.eigvalsh(p.T @ p / len(nb))
            feats[k, :3] = np.maximum(ev, 0.0) ** 0.5 / r
            d = np.linalg.norm(p, axis=1)
            h, _ = np.histogram(d, bins=nbins, range=(0.0, r))
            feats[k, 3:] = h / max(len(nb), 1)
        sigs.append(feats)
    return np.concatenate(sigs, axis=1)


def distinctiveness(pts, tree, centers, r=0.15):
    """Surface-variation score per center: lambda_min / trace of the local
    covariance (0 for a perfect plane, up to 1/3 for isotropic clutter)."""
    lists = tree.query_ball_point(centers, r)
    s = np.zeros(len(centers), np.float32)
    for k, nb in enumerate(lists):
        if len(nb) < 8:
            continue
        p = pts[nb] - pts[nb].mean(axis=0)
        ev = np.linalg.eigvalsh(p.T @ p / len(nb))
        tr = max(float(ev.sum()), 1e-12)
        s[k] = max(float(ev[0]), 0.0) / tr
    return s


def scene_accuracy(path, rng, num_corr=128, biased=False):
    from scipy.spatial import cKDTree

    with np.load(path) as z:
        w0, w1, pairs = z["w0"], z["w1"], z["pairs"]
    t0, t1 = cKDTree(w0), cKDTree(w1)
    if biased and len(pairs) > num_corr:
        # prefer correspondences anchored at non-planar local geometry,
        # softmax-sampled so the batch is still stochastic
        score = distinctiveness(w0, t0, w0[pairs[:, 0]])
        p = np.exp(score / 0.02)
        p /= p.sum()
        pairs = pairs[rng.choice(len(pairs), num_corr, replace=False, p=p)]
    elif len(pairs) > num_corr:
        pairs = pairs[rng.choice(len(pairs), num_corr, replace=False)]
    s0 = patch_signature(w0, t0, w0[pairs[:, 0]])
    s1 = patch_signature(w1, t1, w1[pairs[:, 1]])
    d = np.linalg.norm(s0[:, None] - s1[None], axis=-1)
    return float(np.mean(np.argmin(d, axis=1) == np.arange(len(pairs))))


def main():
    biased = "--biased" in sys.argv
    roots = [a for a in sys.argv[1:] if not a.startswith("--")]
    rng = np.random.default_rng(0)
    for root in roots:
        files = sorted(glob.glob(os.path.join(root, "scene_*.npz")))
        if not files:
            print(f"{root}: no scenes")
            continue
        files = [files[i] for i in
                 rng.choice(len(files), min(12, len(files)), replace=False)]
        accs = [scene_accuracy(p, rng, biased=biased) for p in files]
        print(f"{root}: signature 1-NN accuracy{' (biased)' if biased else ''} "
              f"mean {np.mean(accs):.3f}  min {np.min(accs):.3f}  "
              f"max {np.max(accs):.3f}  (chance ~{1/128:.3f}, "
              f"{len(files)} scenes)")


if __name__ == "__main__":
    main()
