#!/bin/bash
# CLIPA ViT-H/14 stage-2 finetune at 224px (reference scripts/h14_224_32_finetune.sh).
set -e
python -m xtagclip_tpu.cli.main \
    --model ViT-H-14-CL32-GAP \
    --train-data "${LAION_SHARDS:-}" \
    --dataset-type webdataset \
    --train-num-samples "${TRAIN_NUM_SAMPLES:-10000000}" \
    --batch-size 4096 \
    --precision amp_bf16 \
    --lr 2.048e-4 --beta1 0.9 --beta2 0.95 --wd 0.2 --eps 1e-8 \
    --warmup 800 \
    --epochs 1 \
    --force-image-size 224 \
    --pretrained "${STAGE1_CKPT:-}" \
    --grad-checkpointing \
    --fsdp \
    --local-loss --gather-with-grad \
    "$@"
