#!/bin/bash
# Round-4c chip session (runs after the r4b2 indoor campaign frees the
# chip): validate + measure the round-4 kernel additions.
#   [1] on-chip parity of multi-cloud EM + the two alpha emissions — the
#       GATE: these kernels are wired into the DEFAULT eval/train paths,
#       so they must be proven on chip before the driver's bench run.
#   [2] tracked bench line with both changes live (EM C=2 + alpha paths)
#   [3] EM clouds_per_block A/B (the 4.33 ms eval pole)
#   [4] indoor control (should be unchanged: EM is jnp at N=35k/K=16 and
#       the alpha path needs the fused kernel, N <= 1024)
# Ordered gate -> headline -> detail so an end-of-round clock cut still
# leaves the important numbers. ONE chip job at a time (CLAUDE.md).
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4c_session.log}
{
  echo "=== r4c chip session $(date) ==="

  echo "--- [1/4] kernel parity on chip (gate) ---"
  timeout 1500 python scripts/verify_r4c.py
  echo "verify rc=$?"

  echo "--- [2/4] tracked bench line ---"
  timeout 2700 python bench.py
  echo "bench rc=$?"

  echo "--- [3/4] EM clouds_per_block A/B ---"
  timeout 1800 python scripts/kernel_ab_em.py

  echo "--- [4/4] indoor control ---"
  timeout 1200 python scripts/bench_indoor.py 35000 4

  echo "=== r4c session done $(date) ==="
} > "$LOG" 2>&1
