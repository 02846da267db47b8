#!/usr/bin/env bash
# Single-image RGB-D demo -> mask / skeleton / mesh-overlay images.
set -ex

INPUT=${1:-assets/H2O}
CHECKPOINT=${2:-}

ARGS=(--input "${INPUT}" --out outputs/demo --res 384)
if [ -n "${CHECKPOINT}" ]; then ARGS+=(--ckpt "${CHECKPOINT}"); fi

python -m pdfnet_tpu.cli.demo "${ARGS[@]}"
