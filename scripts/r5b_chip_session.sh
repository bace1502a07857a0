#!/bin/bash
# Round-5b chip session — indoor ACCURACY evidence on a statistically
# meaningful eval split + a fresh indoor profile (VERDICT r4 #4, #9, and
# the scouting pass for #7). One chip job at a time (CLAUDE.md).
#
#   [0] generate a 128-fragment eval split (host CPU, recall quantum
#       0.0078 — the 32-fragment campaign split's 0.031 quantum made
#       best-vs-final ranking selection noise)
#   [1] rank every surviving r4b checkpoint on it
#       (scripts/eval_indoor_rank.py)
#   [2] serve-dial sweep (em 10/6/4) vs the best artifact on the SAME
#       split (re-validates the em6 dial with the fixed alpha, #9)
#   [3] fresh indoor eval-forward trace (profiles/, parse separately) —
#       the r3 profile predates the Morton/cull/shared-graph work; #7
#       needs the real current pole split before designing the fused
#       encoder
#
# Log to $1 (default /tmp/r5b_session.log).
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5b_session.log}
ROOT=/tmp/indoor_data_r5eval
{
  echo "=== r5b accuracy session $(date) ==="
  echo "--- [0] 128-fragment eval split ---"
  [ -d $ROOT/7scene/7-scenes-office ] || \
    timeout 1800 python scripts/gen_indoor_fragments.py $ROOT 1 128
  ls $ROOT/7scene/7-scenes-office | wc -l
  echo "--- [1] checkpoint ranking ---"
  timeout 7200 python scripts/eval_indoor_rank.py $ROOT \
    e159_best=artifacts/gmmreg_indoor_r4.npz \
    e9_attempt1=artifacts/gmmreg_indoor_r4_e9.npz \
    e50=/tmp/ckpt_indoor_r4b2:model_0050 \
    e100=/tmp/ckpt_indoor_r4b2:model_0100 \
    e150=/tmp/ckpt_indoor_r4b2:model_0150 \
    e200_final=/tmp/ckpt_indoor_r4b2:model_0200
  echo "rank rc=$?"
  echo "--- [2] serve-dial sweep on the big split ---"
  timeout 7200 python scripts/eval_em_sweep.py --root=$ROOT \
    artifacts/gmmreg_indoor_r4.npz 10 6 4
  echo "sweep rc=$?"
  echo "--- [3] indoor eval-forward trace ---"
  timeout 3600 python scripts/profile_indoor.py 35000
  echo "profile rc=$?"
  echo "=== r5b session done $(date) ==="
} > "$LOG" 2>&1
