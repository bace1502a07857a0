#!/bin/bash
# Round-5c chip session — v-space graph routing + the edges-fused DGCNN
# encoder (VERDICT r4 #7). Order is load-bearing (the r4 lesson): parity
# gate FIRST, then the A/Bs, then fresh benches so the tracked numbers are
# measured with gated kernels. One chip job at a time (CLAUDE.md).
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5c_session.log}
{
  echo "=== r5c vspace+edges session $(date) ==="
  echo "--- [1/5] parity gate (verify_r5c) ---"
  timeout 3600 python scripts/verify_r5c.py 35000
  rc=$?
  echo "gate rc=$rc"
  if [ $rc -ne 0 ]; then
    echo "GATE FAILED — not benching with the new routing in the default path"
    exit 1
  fi
  echo "--- [2/5] encoder + full-forward routing A/B ---"
  timeout 3600 python scripts/kernel_ab_edges.py 35000 4
  echo "ab rc=$?"
  echo "--- [3/5] indoor train step: vspace vs r4 control ---"
  timeout 1800 python scripts/train_step_indoor.py 35000
  timeout 1800 python scripts/train_step_indoor.py 35000 control
  echo "train rc=$?"
  echo "--- [4/5] tracked indoor bench ---"
  timeout 1800 python scripts/bench_indoor.py 35000 4
  echo "indoor rc=$?"
  echo "--- [5/5] fresh bench.py ---"
  timeout 5400 python bench.py
  echo "bench rc=$?"
  echo "=== r5c session done $(date) ==="
} > "$LOG" 2>&1
