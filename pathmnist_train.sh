#!/bin/bash
# PathMNIST fine-tune (reference pathmnist_train.sh).
set -e
python -m xtagclip_tpu.cli.main_other \
    --batch-size 16 \
    --workers 4 \
    --train-data "${PATHMNIST_TRAIN:-}" \
    --val-data "${PATHMNIST_VAL:-}" \
    --precision amp \
    --save-frequency 100 \
    --warmup 50 \
    --lr 5e-6 \
    --wd 0.1 \
    --epochs 500 \
    --local-loss \
    --model ViT-B-32 \
    --pretrained "${PRETRAINED:-laion400m_e32}" \
    --delete-previous-checkpoint \
    --save-most-recent \
    "$@"
