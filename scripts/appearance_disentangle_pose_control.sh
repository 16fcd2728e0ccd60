#!/usr/bin/env bash
# Stage 2: appearance-disentangled pose control
# (ref: scripts/appearance_disentangle_pose_control.sh — bs 8/dev, bin 29)
set -euo pipefail
python -m magicdance_tpu.cli.train \
  --stage 2 \
  --data "${DATA:-TikTok-v4}" \
  --output "${OUTPUT:-runs/stage2}" \
  ${INIT_CKPT:+--init_checkpoint "$INIT_CKPT"} \
  "$@"
