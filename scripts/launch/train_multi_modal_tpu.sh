#!/usr/bin/env bash
# TPU-VM analog of the reference SLURM wrapper
# (/root/reference/script/train_multi_modal.sh): single v5e host.
# Usage: ./train_multi_modal_tpu.sh <eid> <mask_ratio> [extra args...]
set -euo pipefail
EID="${1:?usage: $0 <eid> <mask_ratio> [extra args]}"
RATIO="${2:-0.3}"
shift 2 || true
cd "$(dirname "$0")/../.."
python scripts/train_multi_modal.py \
    --eid "$EID" \
    --mask_ratio "$RATIO" \
    --mixed_training --use_MtM \
    --base_path results \
    "$@"
python scripts/eval_multi_modal.py \
    --eid "$EID" \
    --mask_ratio "$RATIO" \
    --mixed_training \
    --base_path results \
    "$@"
