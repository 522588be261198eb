#!/bin/bash
# Round-4 second sweep: gate LM patience on the ADOPTED production bundle
# (ns16-m50-map10-pat, 3 seeds) — the 30-FPS-stretch candidate
# (AB_QUALITY.md conclusion 13). Repo-resident + idempotent like sweep_r4.sh.
set -u
cd "$(dirname "$0")/.."
mkdir -p sweeps
{
  echo "=== sweep_r4b start $(date -u +%FT%TZ) ==="
  python scripts/ab_quality.py --skip-done --seeds 0,1 --variants ns16-m50-map10-pat
  python scripts/ab_quality.py --report-only
  echo "=== sweep_r4b done $(date -u +%FT%TZ) ==="
} >> sweeps/r4.log 2>&1
