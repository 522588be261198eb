#!/bin/bash
# Round-4 third sweep: the two remaining single-axis throughput candidates
# on the adopted production bundle (see scripts/ab_quality.py variant
# comments): lm8 (tracking ~35 FPS if pose accuracy holds) and m25
# (mapper bound 11.2 -> ~22 FPS for the 2-chip point). 3 seeds each,
# repo-resident + idempotent.
set -u
cd "$(dirname "$0")/.."
mkdir -p sweeps
{
  echo "=== sweep_r4c start $(date -u +%FT%TZ) ==="
  python scripts/ab_quality.py --skip-done --seeds 0,1,2 --variants ns16-m50-map10-lm8
  python scripts/ab_quality.py --skip-done --seeds 0,1,2 --variants ns16-m25-map10
  python scripts/ab_quality.py --report-only
  echo "=== sweep_r4c done $(date -u +%FT%TZ) ==="
} >> sweeps/r4.log 2>&1
