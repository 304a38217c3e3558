"""On-chip A/B for the ``eval_gate_topm`` top-M local-max gate.

VERDICT r4 item 4b: the gate (models/kpfcnn.py detection_scores) restricts
the expensive [*, K0, D] local-max gather to the global top-M rows by
ungated score. Top-k keypoint selection downstream stays exact only if
every fragment keeps >= k detected candidates inside the top-M — the
condition now guarded at the consumer (eval/matching.select_keypoints).
This tool validates the claim end-to-end at the BENCH operating point
(same shapes, caps and M formula as bench.py) and measures the gate's
throughput contribution:

  * identical top-250 keypoint SETS per fragment, gate on vs off
    (reference semantics: architectures.py:361-366 + test.py:52-57 —
    local-max sparsify, then argsort tail);
  * fragments/s with the gate on vs off.

Writes GATE_AB.json. Run on the real chip (or --cpu for a logic check).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--snapshot", default="artifacts/model_best_acc_r5.npz",
                    help="portable npz weights (trained operating point)")
    ap.add_argument("--fragments", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--k", type=int, default=250)
    ap.add_argument("--b", type=int, default=2,
                    help="fragments per call (match bench FRAGS_PER_CALL)")
    ap.add_argument("--out", default="GATE_AB.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    _CACHE = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from d3feat_tpu.config import D3FeatConfig, PyramidCaps
    from d3feat_tpu.data.pack import pack_fragments
    from d3feat_tpu.data.synthetic import scan_fragment
    from d3feat_tpu.eval.matching import select_keypoints
    from d3feat_tpu.train.step import init_train_state, make_extract_step

    # ---- bench.py operating point (B overridable for batching A/Bs) ----
    B = args.b
    NC = max(2, B)
    cfg = D3FeatConfig()
    cfg.caps = PyramidCaps(
        points=(16384 * B, 8192 * B, 2048 * B, 768 * B, 256 * B),
        neighbors=(40, 40, 40, 40, 40),
        corr=128,
    )
    cfg.query_tile = 512
    M = 16 * args.k * B

    ts, specs = init_train_state(jax.random.key(0), cfg)
    params, mstate = ts.params, ts.model_state
    snap = None
    if args.snapshot and os.path.exists(args.snapshot):
        from d3feat_tpu.compat.portable import import_npz

        params, mstate, meta = import_npz(args.snapshot, params, mstate)
        snap = {"path": args.snapshot, "epoch": meta.get("epoch"),
                "best_acc": meta.get("best_acc")}
        print(f"[gate_ab] weights: {args.snapshot} (epoch {snap['epoch']}, "
              f"val-acc {snap['best_acc']})")
    else:
        print("[gate_ab] WARNING: random-init weights (snapshot missing) — "
              "score field is untrained; set --snapshot for the real test")
    # import_npz returns host numpy arrays; without an explicit device_put
    # every extract call re-ships the full parameter set over the tunnel
    # (~2 s/call), swamping the measurement.
    params = jax.device_put(params)
    mstate = jax.device_put(mstate)

    import copy

    cfg_on = cfg
    cfg_on.eval_gate_topm = M
    cfg_off = copy.deepcopy(cfg)
    cfg_off.eval_gate_topm = 0

    extract_on = jax.jit(make_extract_step(cfg_on, specs, num_clouds=NC))
    extract_off = jax.jit(make_extract_step(cfg_off, specs, num_clouds=NC))

    rng = np.random.default_rng(0)
    N_MIN, N_MAX = 12000, 16000

    def fragment():
        f = scan_fragment(rng)
        while not (N_MIN <= len(f) <= N_MAX):
            f = scan_fragment(rng)
        return f

    frags = [fragment() for _ in range(args.fragments)]
    batches = []
    for i in range(0, len(frags), B):
        b = pack_fragments(frags[i:i + B], point_capacity=cfg.caps.points[0],
                           num_clouds=NC)
        batches.append({k: jnp.asarray(v) for k, v in b.items()})
    jax.block_until_ready([jnp.sum(v) for bb in batches for v in bb.values()])

    # ---- exactness: per-fragment top-k sets must match ----
    per_frag = []
    overflow = False
    for bi, bb in enumerate(batches):
        _, s_on, ov1 = map(np.asarray, extract_on(params, mstate, bb))
        _, s_off, ov2 = map(np.asarray, extract_off(params, mstate, bb))
        overflow |= bool(ov1) or bool(ov2)
        lengths = np.asarray(bb["lengths"])
        row = 0
        for ci in range(NC):
            n = int(lengths[ci])
            if n == 0:
                continue
            so_on = s_on[row:row + n].squeeze()
            so_off = s_off[row:row + n].squeeze()
            det_on = int(np.sum(so_on > 0.0))
            det_off = int(np.sum(so_off > 0.0))
            k_on = set(select_keypoints(so_on, args.k, on_short="warn").tolist())
            k_off = set(select_keypoints(so_off, args.k, on_short="warn").tolist())
            inter = len(k_on & k_off)
            per_frag.append({
                "fragment": bi * B + ci, "n_points": n,
                "detected_gated": det_on, "detected_ungated": det_off,
                "topk_overlap": inter, "k": args.k,
                "exact": inter == args.k,
            })
            row += n
    n_exact = sum(f["exact"] for f in per_frag)
    print(f"[gate_ab] exactness: {n_exact}/{len(per_frag)} fragments with "
          f"identical top-{args.k} sets (M={M})")

    # ---- throughput: gate on vs off ----
    def timed(fn):
        for bb in batches[:2]:  # warmup (compile done above, still settle)
            jax.block_until_ready(fn(params, mstate, bb))
        t0 = time.perf_counter()
        it = 0
        for _ in range(args.iters):
            for bb in batches:
                out = fn(params, mstate, bb)
                it += B
        jax.block_until_ready(out)
        return it / (time.perf_counter() - t0)

    fps_on = timed(extract_on)
    fps_off = timed(extract_off)
    print(f"[gate_ab] throughput: gate ON {fps_on:.2f} fr/s, "
          f"OFF {fps_off:.2f} fr/s ({(fps_on / fps_off - 1) * 100:+.1f}%)")

    result = {
        "backend": jax.devices()[0].platform,
        "snapshot": snap,
        "M": M, "k": args.k, "B": B,
        "fragments": per_frag,
        "all_exact": n_exact == len(per_frag),
        "overflow": overflow,
        "fps_gate_on": round(fps_on, 3),
        "fps_gate_off": round(fps_off, 3),
        "speedup_pct": round((fps_on / fps_off - 1) * 100, 2),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[gate_ab] wrote {args.out}")
    return 0 if result["all_exact"] else 1


if __name__ == "__main__":
    sys.exit(main())
