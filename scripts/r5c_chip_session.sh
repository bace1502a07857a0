#!/bin/bash
# Round-5c chip session — the edges-fused DGCNN encoder (VERDICT r4 #7).
# Order is load-bearing (the r4 lesson): parity gate FIRST, then the A/B,
# then a fresh bench so the tracked numbers are measured with a gated
# kernel. One chip job at a time (CLAUDE.md).
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5c_session.log}
{
  echo "=== r5c edges-encoder session $(date) ==="
  echo "--- [1/3] parity gate (verify_r5c) ---"
  timeout 3600 python scripts/verify_r5c.py 35000
  rc=$?
  echo "gate rc=$rc"
  if [ $rc -ne 0 ]; then
    echo "GATE FAILED — not benching with the kernel in the default path"
    exit 1
  fi
  echo "--- [2/3] encoder + full-forward A/B ---"
  timeout 3600 python scripts/kernel_ab_edges.py 35000 4
  echo "ab rc=$?"
  echo "--- [3/3] fresh bench.py ---"
  timeout 5400 python bench.py
  echo "bench rc=$?"
  echo "=== r5c session done $(date) ==="
} > "$LOG" 2>&1
