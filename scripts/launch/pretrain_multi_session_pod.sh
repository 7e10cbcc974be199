#!/usr/bin/env bash
# Multi-host pod-slice pretraining (BASELINE.json config 5: 80+ sessions
# data-parallel over a v5e pod). Run the SAME command on every TPU-VM
# worker; jax.distributed.initialize() picks up the TPU pod env and the
# 'data' mesh spans all chips. Per-host session sharding: pass each worker
# a disjoint --eids slice from the session list file.
# Usage: ./pretrain_multi_session_pod.sh <eids_file> [extra args...]
set -euo pipefail
EIDS_FILE="${1:?usage: $0 <eids_file> [extra args]}"
shift || true
cd "$(dirname "$0")/../.."
mapfile -t EIDS < "$EIDS_FILE"
python scripts/train_multi_session.py \
    --eids "${EIDS[@]}" \
    --use_MtM --mixed_training \
    --dp -1 \
    --base_path results \
    "$@"
