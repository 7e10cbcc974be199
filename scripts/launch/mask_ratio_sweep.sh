#!/usr/bin/env bash
# Mask-ratio sweep (the workload behind src/draw/draw_mask_ratio.py:
# ratio in {0.1..0.5}, mixed training), then the comparison figure.
set -euo pipefail
EID="${1:?usage: $0 <eid> [extra args]}"
shift || true
cd "$(dirname "$0")/../.."
for RATIO in 0.1 0.2 0.3 0.4 0.5; do
    python scripts/train_multi_modal.py --eid "$EID" --mask_ratio "$RATIO" \
        --mixed_training --base_path results "$@"
    python scripts/eval_multi_modal.py --eid "$EID" --mask_ratio "$RATIO" \
        --mixed_training --base_path results "$@"
done
python scripts/draw_mask_ratio.py \
    --result_dir "results/sweep-$EID" --mask_ratios 0.1 0.2 0.3 0.4 0.5
