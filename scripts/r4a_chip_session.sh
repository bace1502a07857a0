#!/bin/bash
# Round-4a chip session: validate/measure the round-4 additions.
#   [1] cross-shaped kNN cull A/B (knn_cross_spatial vs plain stream) at
#       the sp shapes — the r4 sp session measured the uncull overhead at
#       1.64x (220.0 vs 134.3 ms/pair at mesh 1)
#   [2] sp indoor numbers rerun with the new routing (should close most of
#       the 85.7 ms gap)
#   [3] fresh traces of eval fwd + train step at the bench shape for the
#       byte-breakdown and tail-dissection work (VERDICT r3 next #3/#4)
#   [4] indoor training-smoke with --device_overlap on the NEW fragment
#       generator: flag works on chip + epoch pace vs the r3d 36 s/epoch
# ONE chip job at a time (CLAUDE.md tunnel rules).
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4a_session.log}
{
  echo "=== r4a chip session $(date) ==="

  echo "--- [1/4] cross-kNN cull A/B ---"
  timeout 2400 python scripts/kernel_ab_cross.py

  echo "--- [2/4] sp indoor rerun (culled cross routing) ---"
  timeout 2400 python scripts/verify_sp_chip.py 35000

  echo "--- [3/4] eval + train traces at bench shape ---"
  timeout 2400 python scripts/profile_chip.py profiles/r4

  echo "--- [4/4] indoor train smoke: device_overlap + new fragments ---"
  rm -rf /tmp/indoor_data_r4
  python scripts/gen_indoor_fragments.py /tmp/indoor_data_r4 10 4
  timeout 2400 python train.py --preset indoor --dataset 7scene \
    --root /tmp/indoor_data_r4 --batch_size 4 --epochs 2 --eval_every 2 \
    --dtype bfloat16 --device_overlap \
    --model_path /tmp/ckpt_r4smoke 2>&1 | tail -20

  echo "=== r4a session done $(date) ==="
} > "$LOG" 2>&1
