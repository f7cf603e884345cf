#!/usr/bin/env bash
# Full sweep driver: 7 datasets x 3 image ratios x 4 models
# (reference contract: SNAG_MMEA/run.sh:2-116; usage README.md:91).
#
#   bash scripts/run.sh GPU
#
# Every model covers the same 7 datasets at image ratios 1.0/0.6/0.4 with
# seed 3408, surface off.  One reference quirk preserved: the SNAG rows for
# OEA_EN_FR_15K_V1 / OEA_EN_DE_15K_V1 use noise_ratio 0.8, mask_ratio 0.2
# (run.sh:20-26); every other row uses 0.2 / 0.7.
set -e
GPU="${1:-0}"
HERE="$(cd "$(dirname "$0")" && pwd)"

# dataset split rate
GRID=(
  "DBP15K ja_en 0.3"
  "DBP15K zh_en 0.3"
  "DBP15K fr_en 0.3"
  "OEA_D_W_15K_V2 norm 0.2"
  "OEA_D_W_15K_V1 norm 0.2"
  "OEA_EN_FR_15K_V1 norm 0.2"
  "OEA_EN_DE_15K_V1 norm 0.2"
)

for model in snag meaformer mclea eva; do
  for row in "${GRID[@]}"; do
    read -r DATA SPLIT RATE <<<"$row"
    NR=0.2; MR=0.7
    if [ "$model" = snag ] && { [ "$DATA" = OEA_EN_FR_15K_V1 ] || [ "$DATA" = OEA_EN_DE_15K_V1 ]; }; then
      NR=0.8; MR=0.2
    fi
    for RATIO in 1.0 0.6 0.4; do
      bash "$HERE/run_${model}.sh" "$GPU" "$DATA" "$SPLIT" "$RATE" 3408 0 "$RATIO" "$NR" "$MR"
    done
  done
done
