#!/usr/bin/env bash
# Stage 1: appearance control pretraining
# (ref: scripts/appearance_control_pretraining.sh — bs 32/dev, img_bin_limit 15)
set -euo pipefail
python -m magicdance_tpu.cli.train \
  --stage 1 \
  --data "${DATA:-TikTok-v4}" \
  --output "${OUTPUT:-runs/stage1}" \
  ${INIT_CKPT:+--init_checkpoint "$INIT_CKPT"} \
  "$@"
