#!/usr/bin/env bash
# Batched serving: directory of RGB-D pairs -> predictions.npz (+ challenge
# json).  Throughput scales with batch (48 is the single-chip sweet spot).
set -ex

INPUT=${1:-assets/H2O}
CHECKPOINT=${2:-}
BATCH=${3:-48}
ARGS=(--input "${INPUT}" --out outputs/preds --batch "${BATCH}" --json)
if [ -n "${CHECKPOINT}" ]; then ARGS+=(--ckpt "${CHECKPOINT}"); fi

python -m pdfnet_tpu.cli.infer "${ARGS[@]}"
