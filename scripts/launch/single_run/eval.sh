#!/usr/bin/env bash
# TPU-VM analog of /root/reference/script/ppwang/eval.sh: evaluate the
# mixed-training embd-mask run trained by train.sh (same mask ratio $1).
set -euo pipefail
RATIO="${1:-0.3}"
cd "$(dirname "$0")/../../.."
python scripts/eval_multi_modal.py \
    --eid db4df448-e449-4a6f-a0e7-288711e7a75a \
    --mask_mode temporal \
    --mask_ratio "$RATIO" \
    --mixed_training \
    --seed 42 \
    --save_plot \
    --base_path results \
    "${@:2}"
