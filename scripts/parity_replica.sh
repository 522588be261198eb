#!/usr/bin/env bash
# One-command Replica parity run: SLAM -> ATE -> 2D render metrics -> mesh
# -> 3D metrics -> semantic, with a final table against the expected ranges
# (BASELINE.json: ATE RMSE and mIoU within 5% of the reference).
#
# Usage:
#   scripts/parity_replica.sh <scene-config> <dataset-dir> [out-dir] [gt-mesh]
#   scripts/parity_replica.sh --dry-run            # synthetic smoke, no data
#
# Real data example (the moment a Replica download mounts):
#   scripts/parity_replica.sh configs/replica/room_0.yaml /data/Replica \
#       /tmp/parity_room0 /data/Replica/room_0_mesh_culled.ply
#
# Expected ranges on room_0 (from the DNS-SLAM paper's system family; fill
# with measured reference numbers when available — BASELINE.md):
#   ATE RMSE   <= 0.01 m-ish     rendering PSNR >= 30 dB
#   mIoU       >= 0.80           mesh accuracy/completion few cm
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--dry-run" ]]; then
  CFG=configs/synthetic/synthetic.yaml
  OUT=/tmp/parity_dryrun
  rm -rf "$OUT"
  python -m dnsjax.cli.run "$CFG" --output "$OUT" --end-frame 14
  python -m dnsjax.cli.eval_ate "$CFG" --output "$OUT"
  python -m dnsjax.cli.eval_2d "$CFG" --output "$OUT" --every 6
  python -m dnsjax.cli.extract_mesh "$CFG" --output "$OUT" --resolution 80
  python -m dnsjax.cli.eval_semantic "$CFG" --renders "$OUT/renders"
  echo "parity dry-run complete: artifacts in $OUT"
  exit 0
fi

CFG=${1:?scene config, e.g. configs/replica/room_0.yaml}
DATA=${2:?dataset dir, e.g. /data/Replica}
OUT=${3:-/tmp/parity_$(basename "$CFG" .yaml)}
GT_MESH=${4:-}

rm -rf "$OUT"
python -m dnsjax.cli.run       "$CFG" --input "$DATA" --output "$OUT"
python -m dnsjax.cli.eval_ate  "$CFG" --input "$DATA" --output "$OUT" \
  | tee "$OUT/ate.json"
python -m dnsjax.cli.eval_2d   "$CFG" --input "$DATA" --output "$OUT" --every 10 \
  | tee "$OUT/eval2d.txt"
python -m dnsjax.cli.extract_mesh "$CFG" --input "$DATA" --output "$OUT"
if [[ -n "$GT_MESH" ]]; then
  REC_MESH=$(ls -t "$OUT"/mesh_*.ply | grep -v semantic | grep -v part | head -1)
  python -m dnsjax.cli.eval_3d "$REC_MESH" "$GT_MESH" --depth-views 1000 \
    | tee "$OUT/eval3d.json"
fi
python -m dnsjax.cli.eval_semantic "$CFG" --input "$DATA" --renders "$OUT/renders" \
  | tee "$OUT/semantic.txt"

echo
echo "== parity summary ($CFG) =="
python - "$OUT" << 'EOF'
import json, os, re, sys
out = sys.argv[1]
ate = json.load(open(os.path.join(out, "ate.json")))
print(f"ATE RMSE: {ate['absolute_translational_error.rmse']:.4f} m")
txt = open(os.path.join(out, "eval2d.txt")).read()
m = re.search(r"AVERAGE: (\{.*\})", txt)
if m:
    avg = json.loads(m.group(1))
    print(f"PSNR: {avg['psnr']:.2f} dB   MS-SSIM: {avg['ms_ssim']:.4f}   "
          f"mIoU: {avg['miou']:.3f}")
p3 = os.path.join(out, "eval3d.json")
if os.path.exists(p3):
    print(open(p3).read().strip())
print("Compare against BASELINE.md / the measured reference run; parity "
      "criterion: ATE RMSE and mIoU within 5% (BASELINE.json).")
EOF
