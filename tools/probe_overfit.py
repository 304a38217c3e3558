"""Overfit-one-batch sanity probe for the training path.

Trains the full KPFCNN on a SINGLE fixed fragment pair (no per-step
augmentation). A sound pipeline must memorize 128 correspondences: accuracy
should go well past 90% within a few thousand steps. If it plateaus near
random (1/num_corr), the bug is in the model/loss/correspondence plumbing,
not in the data distribution.

Usage: python tools/probe_overfit.py [--steps 3000] [--scene <npz>]
"""
import argparse
import json
import sys

import numpy as np
import jax

# Pin the platform BEFORE the d3feat_tpu imports below: the package import
# chain touches jax.devices(), and with the harness's frozen
# JAX_PLATFORMS=axon that blocks whenever the chip is held or the claim is
# wedged. The config API is the only override that works post-freeze.
if "--platform" in sys.argv:
    jax.config.update(
        "jax_platforms", sys.argv[sys.argv.index("--platform") + 1])

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from d3feat_tpu.config import D3FeatConfig, PyramidCaps  # noqa: E402
from d3feat_tpu.data.pack import pack_pair  # noqa: E402
from d3feat_tpu.data.synthetic import frame_scan_pair, scan_pair_world  # noqa: E402
from d3feat_tpu.train.step import init_train_state, make_train_step  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--scene", type=str, default=None,
                    help="scene .npz from tools/gen_corpus.py (default: "
                    "generate one on the fly)")
    ap.add_argument("--rotation", type=str, default="axis",
                    choices=["axis", "so3", "none"])
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--num_corr", type=int, default=128)
    ap.add_argument("--log_every", type=int, default=200)
    ap.add_argument("--budget", type=int, default=3000,
                    help="per-cloud point budget in --platform cpu mode")
    ap.add_argument("--warp", type=float, default=0.0,
                    help="domain-warp amplitude for the generated scene "
                         "(gen_corpus --warp); plane-dominated unwarped "
                         "scenes cap memorization accuracy — congruent "
                         "local neighborhoods MUST map to equal "
                         "descriptors, so batch-hard accuracy cannot "
                         "reach 100% no matter how sound the pipeline")
    ap.add_argument("--platform", type=str, default=None,
                    help="'cpu' pins jax to the host (config API — the "
                    "sitecustomize freezes JAX_PLATFORMS, env vars no-op) "
                    "and shrinks shapes so steps stay tractable")
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    rng = np.random.default_rng(123)
    if args.scene:
        with np.load(args.scene) as z:
            w0, w1, pairs = z["w0"], z["w1"], z["pairs"]
    else:
        w0, w1, pairs = scan_pair_world(rng, resolution=(120, 90),
                                        warp=args.warp)
    print(f"scene: {len(w0)} + {len(w1)} pts, {len(pairs)} candidate pairs")

    if args.rotation == "none":
        sel = pairs
        if len(sel) > args.num_corr:
            sel = sel[rng.choice(len(sel), args.num_corr, replace=False)]
        c = w0.mean(axis=0, keepdims=True)
        pts0, pts1 = (w0 - c).astype(np.float32), (w1 - c).astype(np.float32)
        corr = sel.astype(np.int32)
        kp = pts0[corr[:, 0]]
        dk = np.linalg.norm(kp[:, None] - kp[None], axis=-1).astype(np.float32)
    else:
        pts0, pts1, corr, dk = frame_scan_pair(
            rng, w0, w1, pairs, num_corr=args.num_corr, noise=0.005,
            rotation=args.rotation)

    cfg = D3FeatConfig()
    cfg.lr = args.lr
    if args.platform == "cpu":
        # shrink the clouds so a single-core XLA-CPU step stays ~O(100ms):
        # subsample both clouds, keeping all correspondence endpoints
        budget = args.budget
        for which in (0, 1):
            pts = (pts0, pts1)[which]
            if len(pts) <= budget:
                continue
            keep = np.zeros(len(pts), bool)
            keep[corr[:, which]] = True
            rest = np.nonzero(~keep)[0]
            keep[rng.choice(rest, budget - keep.sum(), replace=False)] = True
            new_idx = np.cumsum(keep) - 1
            corr[:, which] = new_idx[corr[:, which]]
            if which == 0:
                pts0 = pts[keep]
            else:
                pts1 = pts[keep]
        if budget <= 1600:
            cfg.caps = PyramidCaps(points=(4096, 3072, 1536, 640, 256),
                                   neighbors=(48,) * 5, corr=args.num_corr)
            cap0 = 4096
        else:
            cfg.caps = PyramidCaps(points=(8192, 4096, 1536, 512, 192),
                                   neighbors=(40,) * 5, corr=args.num_corr)
            cap0 = 8192
    else:
        cfg.caps = PyramidCaps(points=(32768, 14336, 4096, 1280, 384),
                               neighbors=(40,) * 5, corr=args.num_corr)
        cap0 = 32768
    b = pack_pair(pts0, pts1, np.ones((len(pts0), 1), np.float32),
                  np.ones((len(pts1), 1), np.float32), corr, dk,
                  point_capacity=cap0, corr_capacity=args.num_corr)
    batch = {k: jnp.asarray(v) for k, v in b._asdict().items()}

    ts, _ = init_train_state(jax.random.key(0), cfg)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    epoch0 = jnp.int32(0)

    hist = []
    for i in range(args.steps):
        ts, m = step(ts, batch, epoch0)
        if (i + 1) % args.log_every == 0 or i == 0:
            jax.block_until_ready(m.loss)
            rec = dict(step=i + 1, loss=float(m.loss),
                       desc=float(m.desc_loss), acc=float(m.accuracy),
                       d_pos=float(m.d_pos), d_neg=float(m.d_neg),
                       overflow=float(m.overflow), skipped=float(m.skipped))
            hist.append(rec)
            print(json.dumps(rec))
    final = hist[-1]
    verdict = ("PASS: pipeline memorizes" if final["acc"] > 60.0 else
               "FAIL: cannot overfit one batch -> pipeline bug")
    print(verdict)


if __name__ == "__main__":
    main()
