#!/bin/bash
# Round-3g chip session: A/B the dynamic-trip kNN selection + the wproject
# query-tile sweep at the indoor shape, then a fresh indoor end-to-end
# control with the shipped defaults. One chip job at a time; run AFTER the
# r3d training session ends.
set -x
cd "$(dirname "$0")/.."

timeout 3000 python scripts/kernel_ab_dyn.py 2>&1
echo "=== AB_DONE rc=$? ==="

timeout 2400 python scripts/bench_indoor.py 35000 4 2>&1
echo "=== INDOOR_CONTROL_DONE rc=$? ==="
