#!/usr/bin/env bash
# Linear-baseline pair (encoding + decoding), the reference's
# script/train_baseline.sh analog.
set -euo pipefail
EID="${1:?usage: $0 <eid> [extra args]}"
shift || true
cd "$(dirname "$0")/../.."
for DIR in encoding decoding; do
    python scripts/train_baseline.py --eid "$EID" --direction "$DIR" \
        --base_path results "$@"
    python scripts/eval_baseline.py --eid "$EID" --direction "$DIR" \
        --base_path results "$@"
done
