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

    from scene_cache import cache_path, get_scene

    os.makedirs(args.out, exist_ok=True)
    for s in range(args.scenes):
        path = cache_path(args.out, args.seed + s, args.fragments,
                          args.frame, args.warp)
        if os.path.exists(path):
            print(f"scene {s}: exists", flush=True)
            continue
        t0 = time.time()
        frags, poses = get_scene(args.seed + s, args.fragments, args.frame,
                                 args.warp, cache_dir=args.out)
        print(f"scene {s}: {len(frags)} frags, {len(poses)} gt pairs, "
              f"{time.time() - t0:.0f} s", flush=True)


if __name__ == "__main__":
    main()
