#!/bin/bash
# BiomedCLIP fine-tune with both towers locked (reference scar_Biomedclip_pretrain.sh).
set -e
python -m xtagclip_tpu.cli.main_other \
    --batch-size 4 \
    --workers 4 \
    --train-data "${SCAR_TRAIN_DATA:-}" \
    --val-data "${SCAR_VAL_DATA:-}" \
    --precision amp \
    --warmup 50 \
    --lr 5e-6 \
    --wd 0.1 \
    --epochs 100 \
    --lock-image --lock-text \
    --model BiomedCLIP-PubMedBERT_256-vit_base_patch16_224 \
    --pretrained "${PRETRAINED:-}" \
    --prompt-template-setting sentence_1 \
    --use-tagging \
    "$@"
