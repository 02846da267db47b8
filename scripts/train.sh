#!/usr/bin/env bash
# Training recipe (reference scripts/train.sh equivalent).
# Data parallelism covers all visible TPU devices automatically (GSPMD);
# no torch.distributed.launch / GPU pinning is needed.
set -ex

TASK=interact
MODE=train
DATASET=H2O          # H2O | H2O3D | RHD | InterHandNew
BATCH_SIZE=8
INPUT_RES=384
# CHECKPOINT=outputs/ckpt/converted   # e.g. from tools/convert_reference_ckpt.py

python -m pdfnet_tpu.cli.main \
    --task ${TASK} \
    --mode ${MODE} \
    --dataset ${DATASET} \
    --batch_size ${BATCH_SIZE} \
    --default_resolution ${INPUT_RES} \
    --num_epochs 80 \
    --lr 1e-4 --lr_step 30 \
    "$@"
    # --load_model ${CHECKPOINT}
    # --sample_strategy FPS
    # --synthetic --steps 5        # smoke run without H2O caches
