#!/usr/bin/env bash
# Evaluation on the H2O val/test split -> metrics block + hand_poses.json.
set -ex

CHECKPOINT=${1:-outputs/ckpt/converted}

# Batched eval is exact (padded tail rows are masked out of metrics and
# the hand_poses.json submission) and ~10x faster than the reference's
# forced bs=1; pass --eval_batch_size 1 for a reference-identical loop.
python -m pdfnet_tpu.cli.main \
    --task interact \
    --mode test \
    --dataset H2O \
    --eval_batch_size 16 \
    --default_resolution 384 \
    --load_model "${CHECKPOINT}"
