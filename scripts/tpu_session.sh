#!/bin/bash
# Run every pending TPU measurement in priority order, logging to $OUT.
# Designed for a possibly-short tunnel window: cheapest/highest-value first,
# each step bounded by timeout, logs survive a mid-run tunnel death.
#
# Usage: bash scripts/tpu_session.sh   (from the repo root)
set -u
OUT=${OUT:-/tmp/tpu_session}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%T)) ===" | tee -a "$OUT/summary.txt"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -20 "$OUT/$name.log" | tee -a "$OUT/summary.txt"
  echo "--- $name rc=$rc" | tee -a "$OUT/summary.txt"
}

# 1. the pending adoption decision: pallas gather vs xla at both hot shapes
run gather_map   900 python -u scripts/probe_gather.py
run gather_track 900 python -u scripts/probe_gather.py 23500

# 2. decompose the two over-priced profile buckets
run buckets      1200 python -u scripts/probe_buckets.py

# 3. full mapping profile with current adoptions (pallas_sr scatter)
run profile_map  900 python -u scripts/profile_map.py
run profile_track 900 python -u scripts/profile_track.py --interp tet --oneblob quartic

# 3.5 mesh query: fused rows + the per-chunk keyframe view skip
run mesh_query   900 python -u scripts/probe_mesh_query.py

# 4. the headline bench (also exercises tracking + mesh + amortized FPS)
run bench        1800 python -u bench.py

# 5. quality gate for the LM tracker (full-shape synthetic scene; slowest)
run ab_lm        1800 python -u scripts/ab_quality.py --variants lm-track

echo "=== done ($(date +%T)) — logs in $OUT ===" | tee -a "$OUT/summary.txt"
