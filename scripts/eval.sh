#!/usr/bin/env bash
# Evaluation on the H2O val/test split -> metrics block + hand_poses.json.
set -ex

CHECKPOINT=${1:-outputs/ckpt/converted}

python -m pdfnet_tpu.cli.main \
    --task interact \
    --mode test \
    --dataset H2O \
    --batch_size 1 \
    --default_resolution 384 \
    --load_model "${CHECKPOINT}"
