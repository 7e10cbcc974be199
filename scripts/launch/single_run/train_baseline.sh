#!/usr/bin/env bash
# TPU-VM analog of /root/reference/script/ppwang/train_baseline.sh:
# one baseline (encoding+decoding) run on the default session.
set -euo pipefail
cd "$(dirname "$0")/../../.."
python scripts/train_baseline.py \
    --eid db4df448-e449-4a6f-a0e7-288711e7a75a \
    --seed 42 \
    --base_path results \
    "$@"
