#!/bin/bash
# CLIPA ViT-H/14 stage-1 pretrain at 84px with syntax-masked 8-token text
# (reference scripts/h14_84_8_pretrain.sh; torchrun x8 -> one jitted DP mesh).
set -e
python -m xtagclip_tpu.cli.main \
    --model ViT-H-14-CL8-SyntaxMask-GAP \
    --train-data "${LAION_SHARDS:-}" \
    --dataset-type webdataset \
    --train-num-samples "${TRAIN_NUM_SAMPLES:-10000000}" \
    --batch-size 4096 \
    --precision amp_bf16 \
    --lr 2.048e-3 --beta1 0.9 --beta2 0.95 --wd 0.2 --eps 1e-8 \
    --warmup 3200 \
    --epochs 6 \
    --force-image-size 84 \
    --grad-checkpointing \
    --fsdp \
    --local-loss --gather-with-grad \
    "$@"
