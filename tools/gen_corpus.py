"""Pre-generate a disk corpus of world-frame scan scenes for training.

The ray-traced fused-scan generation (~0.6 s/scene on this single-CPU
host) cannot keep up with the TPU train step (~0.1 s), so the expensive
half of every training pair (d3feat_tpu.data.synthetic.scan_pair_world:
two overlapping fused depth scans of one room + up to 1024 candidate GT
correspondences, all in world frame) is generated ahead of time and
written as one .npz per scene. Training then uses DiskScanPairDataset,
which applies only the cheap per-visit augmentation (fresh proper-SO(3)
frames, corr subsample, noise) at load time.

Writes are atomic (tmp + rename) and existing scenes are skipped, so the
tool is resumable and can keep running in the background WHILE training
reads the same directory — the corpus grows between loader epochs.

Run: python tools/gen_corpus.py --out runs/corpus --count 30000 \
         [--seed 777] [--max-points 30000] [--nice]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Host-side tool: pin jax to CPU via the config API BEFORE anything touches
# jax.devices(). The harness presets JAX_PLATFORMS=axon and its sitecustomize
# freezes that into jax.config at interpreter start, so env vars cannot
# override it — and an axon-platform jax.devices() call DIALS THE TPU TUNNEL
# (blocking forever if another process holds the single chip).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/corpus")
    ap.add_argument("--count", type=int, default=30000)
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--max-points", type=int, default=30000,
                    help="skip scenes whose pair exceeds this many points "
                         "(keeps every pair inside the static L0 capacity)")
    ap.add_argument("--min-corr", type=int, default=192,
                    help="skip scenes with fewer candidate correspondences")
    ap.add_argument("--resolution", type=int, nargs=2, default=(160, 120))
    ap.add_argument("--warp", type=float, default=1.5,
                    help="domain-warp amplitude (synthetic.make_warp_field);"
                         " 0 disables. Surface detail is what makes the"
                         " descriptor task learnable on synthetic rooms")
    ap.add_argument("--warp-max", type=float, default=0.0,
                    help="if > --warp, draw each scene's amplitude from "
                         "U(warp, warp_max): amplitude diversity raises the "
                         "corpus's signature discriminability (fresh-scene "
                         "1-NN acc 0.14 @ 1.5 vs 0.19 @ 2.5) while keeping "
                         "lower-amplitude eval scenes in-distribution")
    ap.add_argument("--nice", action="store_true",
                    help="drop process priority to stay out of the way of "
                         "a concurrent training/bench process")
    args = ap.parse_args()

    if args.nice:
        os.nice(19)

    from d3feat_tpu.data.synthetic import crop_pair_to_budget, scan_pair_world

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    written = skipped = 0
    for i in range(args.count):
        path = os.path.join(args.out, f"scene_{i:06d}.npz")
        if os.path.exists(path):
            continue
        rng = np.random.default_rng(args.seed * 1000003 + i)
        warp = args.warp
        if args.warp_max > args.warp:
            warp = float(rng.uniform(args.warp, args.warp_max))
        try:
            w0, w1, pairs = scan_pair_world(
                rng, resolution=tuple(args.resolution), max_corr=1024,
                warp=warp)
        except RuntimeError:
            skipped += 1
            continue
        total = len(w0) + len(w1)
        if total > args.max_points:
            # spatial CROP to the budget, centered on a random GT-pair
            # anchor (so the crop keeps overlap): preserves the full scan
            # density — a random point-thinning here was measured to cost
            # ~0.06 signature 1-NN accuracy on the capped scenes, because
            # it undersamples the warp surface detail the descriptor task
            # depends on. The radius is bisected to the largest window
            # that fits max_points.
            w0, w1, pairs = crop_pair_to_budget(
                rng, w0, w1, pairs, args.max_points)
        if len(pairs) < args.min_corr:
            skipped += 1
            continue
        # leading dot: must NOT match the dataset's scene_*.npz glob;
        # pid suffix: two concurrent generators over the same dir must not
        # collide on the tmp name (the loser's os.replace would crash)
        tmp = os.path.join(args.out, f".tmp_{i:06d}.{os.getpid()}.npz")
        np.savez(tmp, w0=w0, w1=w1, pairs=pairs)
        os.replace(tmp, path)
        written += 1
        if written % 100 == 0:
            dt = time.time() - t0
            print(f"[gen_corpus] {written} written, {skipped} skipped, "
                  f"{dt / max(written, 1):.2f} s/scene", flush=True)
    print(f"[gen_corpus] done: {written} written, {skipped} skipped",
          flush=True)


if __name__ == "__main__":
    main()
