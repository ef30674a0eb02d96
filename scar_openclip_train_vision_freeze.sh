#!/bin/bash
# XTag fine-tune with frozen (locked) text tower, sentence_1 template
# (reference scar_openclip_train_vision_freeze.sh).
set -e
python -m xtagclip_tpu.cli.main_other \
    --batch-size 4 \
    --workers 4 \
    --train-data "${SCAR_TRAIN_DATA:-}" \
    --val-data "${SCAR_VAL_DATA:-}" \
    --precision amp \
    --save-frequency 250 \
    --warmup 50 \
    --lock-text \
    --lr 1e-5 \
    --wd 0.1 \
    --epochs 75 \
    --local-loss \
    --model ViT-B-32 \
    --pretrained "${PRETRAINED:-laion400m_e32}" \
    --prompt-template-setting sentence_1 \
    --use-fusion \
    --use-tagging \
    "$@"
