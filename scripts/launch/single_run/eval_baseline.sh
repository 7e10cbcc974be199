#!/usr/bin/env bash
# TPU-VM analog of /root/reference/script/ppwang/eval_baseline.sh:
# evaluate the baseline run trained by train_baseline.sh.
set -euo pipefail
cd "$(dirname "$0")/../../.."
python scripts/eval_baseline.py \
    --eid db4df448-e449-4a6f-a0e7-288711e7a75a \
    --seed 42 \
    --save_plot \
    --overwrite \
    --base_path results \
    "$@"
