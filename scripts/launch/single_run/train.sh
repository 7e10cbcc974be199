#!/usr/bin/env bash
# TPU-VM analog of the reference's alternate per-user wrapper
# (/root/reference/script/ppwang/train.sh): one mixed-training embd-mask
# run on the default session, mask ratio as $1.
set -euo pipefail
RATIO="${1:-0.3}"
cd "$(dirname "$0")/../../.."
python scripts/train_multi_modal.py \
    --eid db4df448-e449-4a6f-a0e7-288711e7a75a \
    --mask_mode temporal \
    --mask_ratio "$RATIO" \
    --mixed_training \
    --set training.mask_type=embd \
    --seed 42 \
    --base_path results \
    "${@:2}"
