#!/bin/bash
# XTag pretrain: tagging + fusion from a pretrained ViT-B-32
# (reference scar_openclip_pretrain.sh; fill in data paths).
set -e
python -m xtagclip_tpu.cli.main_other \
    --batch-size 4 \
    --workers 4 \
    --train-data "${SCAR_TRAIN_DATA:-}" \
    --val-data "${SCAR_VAL_DATA:-}" \
    --precision amp \
    --save-frequency 250 \
    --warmup 50 \
    --lr 5e-5 \
    --wd 0.1 \
    --epochs 500 \
    --local-loss \
    --model ViT-B-32 \
    --pretrained "${PRETRAINED:-laion400m_e32}" \
    --prompt-template-setting total \
    --use-tagging \
    --use-fusion \
    "$@"
