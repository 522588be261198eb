#!/bin/bash
# Run every pending TPU measurement in priority order, logging to $OUT.
# Designed for a possibly-short tunnel window: cheapest/highest-value first,
# each step bounded by timeout, logs survive a mid-run tunnel death.
#
# Round-5 state: all schedule/sample axes settled (AB_QUALITY.md 9-18).
# Pending: the LM trust-region probes (the last undialed knob), the
# ScanNet-profile row + extraction wall (now inside bench.py), and the
# standing parity dry-run.
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

# 1. the headline bench (reference shape + adopted production point +
#    ScanNet profile + mesh query + extraction wall + amortized FPS;
#    ~15 min)
run bench        2700 python -u bench.py

# 1b. LM trust-region probes on the adopted bundle (1 seed each;
#     AB_QUALITY round-5 promotion rule — beat the bundle on BOTH
#     ATE and PSNR before any 3-seed gate)
run lm_probes    7200 python -u scripts/ab_quality.py --skip-done \
    --variants ns16-m50-map10-lm8-lam2,ns16-m50-map10-lm8-lam4,ns16-m50-map10-lm8-ud

# 2. mesh query component bisect (tracks the one-hot S=1 dispatch and the
#    remaining hashgrid-encode cost; scan/tail/batched variants)
run mesh_bisect  1200 python -u scripts/probe_mesh_bisect.py
run mesh_bisect2 1200 python -u scripts/probe_mesh_bisect2.py

# 3. tracking frame profile at the adopted point (LM, ns16, 500 px)
run profile_track 900 python -u scripts/profile_track.py --interp tet \
    --oneblob quartic --lm-only --samples 16 --lm-iters 8

# 4. parity harness dry-run (synthetic stand-in; fills BASELINE.md the
#    day a real dataset mounts)
run parity_dry   1800 bash scripts/parity_replica.sh --dry-run

echo "=== done ($(date +%T)) — logs in $OUT ===" | tee -a "$OUT/summary.txt"
