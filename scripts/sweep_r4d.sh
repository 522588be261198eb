#!/bin/bash
# Round-4 fourth sweep: the combined bundle (8 LM iters + 25-iter
# keysteps). Launch ONLY after both single-axis gates read green
# (lm8: conclusion 17 GREEN; m25: pending r4c) — the shipped default
# must carry its OWN 3-seed @kf gate, not an inference from the axes
# (ns16-px1k precedent, AB_QUALITY.md conclusion 14).
set -u
cd "$(dirname "$0")/.."
mkdir -p sweeps
{
  echo "=== sweep_r4d start $(date -u +%FT%TZ) ==="
  python scripts/ab_quality.py --skip-done --seeds 0,1,2 --variants ns16-m25-map10-lm8
  python scripts/ab_quality.py --report-only
  echo "=== sweep_r4d done $(date -u +%FT%TZ) ==="
} >> sweeps/r4.log 2>&1
