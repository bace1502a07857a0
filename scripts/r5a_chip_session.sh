#!/bin/bash
# Round-5a chip session — perf evidence AFTER the r5 alpha fix has passed
# the on-chip gate (scripts/verify_r4c.py; run it first, see
# /tmp/r5_verify.log protocol). One chip job at a time (CLAUDE.md).
#
#   [1/3] bench.py            — fresh headline measured post-gate
#                               (VERDICT r4 #1 "done" bar; the r4 1828
#                               number predates the gate)
#   [2/3] kernel_ab_em.py     — EM clouds_per_block C=1/2/4 A/B, the
#                               measurement ops/pallas_em.py's auto gate
#                               cites (VERDICT r4 #2/#6: the r4 citation
#                               was anticipatory — this makes it real)
#   [3/3] bench_indoor.py     — indoor control, scan protocol: settle the
#                               132.8 vs 126.4 ms drift (VERDICT r4 #3)
#
# Log to $1 (default /tmp/r5a_session.log).
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5a_session.log}
{
  echo "=== r5a perf session $(date) ==="
  echo "--- [1/3] bench.py ---"
  timeout 5400 python bench.py
  echo "bench rc=$?"
  echo "--- [2/3] EM clouds_per_block A/B ---"
  timeout 3600 python scripts/kernel_ab_em.py
  echo "em_ab rc=$?"
  echo "--- [3/3] indoor control (N=35000, R=4) ---"
  timeout 3600 python scripts/bench_indoor.py 35000 4
  echo "indoor rc=$?"
  echo "=== r5a session done $(date) ==="
} > "$LOG" 2>&1
