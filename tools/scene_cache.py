"""Shared held-out eval scene cache (one npz per scene).

Single source of truth for the cache filename scheme and npz layout used
by tools/final_recall.py (reader) and tools/gen_eval_cache.py (writer) —
a format drift between the two would make the cache silently miss and
regenerate scenes on-chip, defeating its purpose.

Scenes are the ray-traced multi-fragment rooms of tools/ab_recall.py's
``make_scene`` (exact GT poses, 30%-overlap gt-pair criterion mirroring
the 3DMatch gt.log convention); generation is minutes of host CPU per
scene, so the cache lets the chip phase only load npz files.
"""

import os

import numpy as np


def cache_path(cache_dir: str, seed: int, fragments: int, frame: str,
               warp: float) -> str:
    return os.path.join(
        cache_dir, f"scene_{seed}_{fragments}_{frame}_{warp}.npz")


def save_scene(path: str, frags, poses) -> None:
    """Atomic write (tmp + rename): a concurrent reader never sees a
    partial file and an interrupted run is simply regenerated."""
    tmp = path + ".tmp.npz"
    np.savez(tmp, n_frags=len(frags),
             pair_keys=np.array(list(poses)),  # '<U..' strings
             **{f"frag_{i}": f for i, f in enumerate(frags)},
             **{f"pose_{k}": p for k, p in poses.items()})
    os.replace(tmp, path)


def load_scene(path: str):
    with np.load(path) as z:
        frags = [z[f"frag_{i}"] for i in range(int(z["n_frags"]))]
        poses = {str(k): z[f"pose_{k}"] for k in z["pair_keys"]}
    return frags, poses


def get_scene(seed: int, fragments: int, frame: str, warp: float,
              resolution=(120, 90), cache_dir=None):
    """Load the scene from the cache, or generate (and cache) it."""
    path = cache_path(cache_dir, seed, fragments, frame, warp) \
        if cache_dir else None
    if path and os.path.exists(path):
        return load_scene(path)
    from ab_recall import make_scene

    rng = np.random.default_rng(seed)
    frags, poses, _ = make_scene(rng, fragments, resolution,
                                 frame=frame, warp=warp)
    if path:
        os.makedirs(cache_dir, exist_ok=True)
        save_scene(path, frags, poses)
    return frags, poses
