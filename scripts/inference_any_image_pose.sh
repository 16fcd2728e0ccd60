#!/usr/bin/env bash
# Zero-shot: one reference image + pose sequence
# (ref: scripts/inference_any_image_pose.sh — DDIM-50 cfg 7)
set -euo pipefail
python -m magicdance_tpu.cli.sample \
  --checkpoint "${CKPT:?set CKPT=path/to/model_state-110000.th}" \
  --reference "${REF:?set REF=path/to/image}" \
  --pose_dir "${POSE_DIR:?set POSE_DIR=path/to/pose_maps}" \
  --output "${OUTPUT:-out}" --gif "$@"
