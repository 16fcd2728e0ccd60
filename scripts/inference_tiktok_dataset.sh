#!/usr/bin/env bash
# TikTok eval-set inference + metrics (ref: scripts/inference_tiktok_dataset.sh)
set -euo pipefail
OUT="${OUTPUT:-eval_out}"
python -m magicdance_tpu.cli.eval \
  --checkpoint "${CKPT:?set CKPT=path/to/model_state-110000.th}" \
  --data "${DATA:-TikTok-v4}" \
  --output "$OUT" "$@"
python -m magicdance_tpu.metrics.center --root "$OUT" --type l1 ssim psnr
