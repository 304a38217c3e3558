"""Pre-generate the held-out eval scene cache used by tools/final_recall.py.

Scene generation (ray-traced fused scans at 120x90, 12 fragments/scene)
is minutes of host CPU per scene; this writes the exact npz files
final_recall's --scene_cache loader expects so the chip phase at round
endgame only loads them. Runs niced, pure host CPU.

Run: python tools/gen_eval_cache.py --out runs/eval_cache \
        [--seed 424242] [--scenes 4] [--fragments 12] [--warp 2.0]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # never dial the TPU tunnel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/eval_cache")
    ap.add_argument("--seed", type=int, default=424242)
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--fragments", type=int, default=12)
    ap.add_argument("--warp", type=float, default=2.0)
    ap.add_argument("--frame", type=str, default="axis")
    ap.add_argument("--nice", action="store_true")
    args = ap.parse_args()
    if args.nice:
        os.nice(19)

    from ab_recall import make_scene

    os.makedirs(args.out, exist_ok=True)
    for s in range(args.scenes):
        path = os.path.join(
            args.out, f"scene_{args.seed + s}_{args.fragments}_"
                      f"{args.frame}_{args.warp}.npz")
        if os.path.exists(path):
            print(f"scene {s}: exists", flush=True)
            continue
        t0 = time.time()
        rng = np.random.default_rng(args.seed + s)
        frags, poses, _ = make_scene(rng, args.fragments, (120, 90),
                                     frame=args.frame, warp=args.warp)
        tmp = path + ".tmp.npz"
        np.savez(tmp, n_frags=len(frags),
                 pair_keys=np.array(list(poses)),
                 **{f"frag_{i}": f for i, f in enumerate(frags)},
                 **{f"pose_{k}": p for k, p in poses.items()})
        os.replace(tmp, path)
        print(f"scene {s}: {len(frags)} frags, {len(poses)} gt pairs, "
              f"{time.time() - t0:.0f} s", flush=True)


if __name__ == "__main__":
    main()
