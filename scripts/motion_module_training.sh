#!/usr/bin/env bash
# Stage 3: motion-module (temporal) training — the stage the reference
# half-ships (train_tiktok.py:847-956 references temporal YAMLs that were
# never released; motion_module.py). MOTION_ONLY freeze regime: everything
# except the AnimateDiff-style temporal transformers stays frozen.
#
#   INIT_CKPT  — stage-2 MagicPose checkpoint (model_state-*.th) to convert
#   MM_CKPT    — AnimateDiff motion-module init (e.g. mm_sd_v15.ckpt),
#                merged via the merge_state_dict_mm key remap
set -euo pipefail
python -m magicdance_tpu.cli.train \
  --stage 3 \
  --data "${DATA:-TikTok-v4}" \
  --output "${OUTPUT:-runs/stage3_motion}" \
  ${INIT_CKPT:+--init_checkpoint "$INIT_CKPT"} \
  ${MM_CKPT:+--motion_module_checkpoint "$MM_CKPT"} \
  "$@"
