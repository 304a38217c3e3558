#!/bin/bash
# Round-5 endgame: run after the 150-epoch trainer exits and the chip is
# free. Freezes the final autoexported artifact, then produces the three
# evidence files the README/round notes cite, plus bench A/Bs.
#
#   bash tools/endgame_r5.sh            # full sequence, ~30 min
#
# Each step is independent; on failure fix and re-run from the failed one.
set -euo pipefail
cd "$(dirname "$0")/.."

SNAP=/tmp/final_r5.npz
cp artifacts/model_best_acc_r5.npz "$SNAP"
python - <<'EOF'
import numpy as np, json
z = np.load('/tmp/final_r5.npz', allow_pickle=True)
print('frozen artifact meta:', json.loads(str(z['__meta__'])) if '__meta__' in z.files else '?')
EOF

echo "=== 1/4 final_recall (chip, 8 held-out cached scenes) ==="
python tools/final_recall.py --snapshot "$SNAP" --scenes 8 \
    --scene_cache artifacts/eval_cache --out TRAIN_RECALL_r05.json
python -c "import json; d=json.load(open('TRAIN_RECALL_r05.json')); \
print('recall', d['recall_trained'], 'per-scene', d['per_scene_recall']['trained']['per_scene_recall'])"

# NOTE: this step is CPU-only (both stacks pinned to cpu) — it can (and
# should) run BEFORE the trainer exits, at the then-best artifact, so the
# chip window is spent on the chip-only steps. Skip here if already done.
echo "=== 2/4 cross-stack trained A/B (CPU, torch reference) ==="
python tools/ab_recall.py --snapshot "$SNAP" --warp 2.0 --fragments 24 \
    --out AB_RECALL_TRAINED_r05.json
python -c "import json; d=json.load(open('AB_RECALL_TRAINED_r05.json')); \
print('gap', d['abs_recall_gap'], 'ours', d['recall_ours'], 'ref', d['recall_ref'])"

echo "=== 3/4 headline bench (B=2 default) ==="
python bench.py

echo "=== 4/5 bench batching A/B (B=4, B=8) ==="
BENCH_FRAGS_PER_CALL=4 python bench.py
BENCH_FRAGS_PER_CALL=8 python bench.py

echo "=== 5/5 regenerate MFU.md at the TRUE bench operating point ==="
# the committed MFU.md came from a trace taken minutes before f9f385a
# fixed the tool to B=2 + top-M gate; this re-trace closes that gap
python tools/mfu_report.py
