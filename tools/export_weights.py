"""Export a training snapshot as a portable params-only .npz artifact.

Orbax snapshots (full TrainState: params + momentum + step) are ~3x the
parameter size and directory-shaped; this converts one into a single
compressed npz (d3feat_tpu.compat.portable) small enough to commit, so
the trained model survives host resets and ships with the repo.

Run: python tools/export_weights.py --snapshot runs/r4/corpus4w \
        --name model_best_acc --out artifacts/model_best_acc_r4.npz
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # host-side tool; never dial TPU


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", default="runs/r4/corpus4w")
    ap.add_argument("--name", default="model_best_acc")
    ap.add_argument("--out", default="artifacts/model_best_acc_r4.npz")
    args = ap.parse_args()

    from d3feat_tpu.compat.portable import export_npz
    from d3feat_tpu.config import D3FeatConfig
    from d3feat_tpu.train.checkpoint import SnapshotManager
    from d3feat_tpu.train.step import init_train_state

    with open(os.path.join(args.snapshot, "config.json")) as f:
        cfg_dict = json.load(f)
    cfg = D3FeatConfig.from_dict(cfg_dict)
    ts, _ = init_train_state(jax.random.key(cfg.seed), cfg)
    state, meta = SnapshotManager(args.snapshot).restore(args.name, ts)
    meta = dict(meta, snapshot=args.name, config=cfg_dict)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    export_npz(args.out, state.params, state.model_state, meta=meta)
    mb = os.path.getsize(args.out) / 1e6
    # periodic/last snapshots may lack epoch/best_acc in their meta
    epoch = meta.get("epoch", "?")
    acc = meta.get("best_acc")
    acc = f"{acc:.4f}" if isinstance(acc, (int, float)) else "?"
    print(f"wrote {args.out} ({mb:.1f} MB), meta epoch={epoch} "
          f"best_acc={acc}")


if __name__ == "__main__":
    main()
