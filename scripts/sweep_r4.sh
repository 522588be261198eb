#!/bin/bash
# Round-4 gate-resolving sweep (VERDICT r3 next-round #1).
#
# Everything persistent lives under the REPO (sweeps/r4.log + incremental
# appends to ab_quality.json), not /tmp — three prior sweep relaunches died
# with /tmp wipes. Idempotent: --skip-done consults ab_quality.json, so
# relaunching after any interruption resumes exactly where it stopped.
#
# Queue order = gate-resolution priority:
#   1. 3rd seeds of parity/lm-track/ns16/ns16-m50-map10 @kf — resolves the
#      lm-track seed-mean gate (currently NO on 2 seeds) and hardens the
#      already-passing ns16-m50-map10 adoption.
#   2. lm-px1k x2 seeds — the candidate default if lm-track's gate stays red
#      (lm-px2k@kf already measured parity-level ATE at 4.2 FPS; 1k px ~9 FPS).
#   3. ns16-px1k x2 seeds — the combined-axes candidate.
#   4. lm-px2k 2nd seed — seed-mean for the accuracy-ceiling row.
#   5. Regen of the batch-1 rows lost with /tmp (m50/map10/lm-track-pat @kf)
#      so AB_QUALITY.md carries the recorded rejections.
set -u
cd "$(dirname "$0")/.."
mkdir -p sweeps
{
  echo "=== sweep_r4 start $(date -u +%FT%TZ) ==="
  python scripts/ab_quality.py --skip-done --seeds 2 \
      --variants parity,lm-track,ns16,ns16-m50-map10
  python scripts/ab_quality.py --skip-done --seeds 0,1 --variants lm-px1k
  python scripts/ab_quality.py --skip-done --seeds 0,1 --variants ns16-px1k
  python scripts/ab_quality.py --skip-done --seeds 1 --variants lm-px2k
  python scripts/ab_quality.py --skip-done --seeds 0 \
      --variants m50,map10,lm-track-pat
  python scripts/ab_quality.py --report-only
  echo "=== sweep_r4 done $(date -u +%FT%TZ) ==="
} >> sweeps/r4.log 2>&1
