#!/bin/bash
# XTag stage-2 fine-tune: resume a pretrain checkpoint, load only the tagging
# modules, short low-LR schedule with the sentence_1 template.
# (reference src/open_clip/scar_openclip_train.sh; fill in data paths and the
# checkpoint to resume via RESUME=/path/to/checkpoint)
set -e
python -m xtagclip_tpu.cli.main_other_simple \
    --batch-size 4 \
    --workers 4 \
    --report-to "${REPORT_TO:-wandb}" \
    --wandb-project-name "${WANDB_PROJECT:-Scar_ViT-B-32_laion400m_e32}" \
    --train-data "${SCAR_TRAIN_DATA:-}" \
    --val-data "${SCAR_VAL_DATA:-}" \
    --precision amp \
    --save-frequency 250 \
    --warmup 50 \
    --lr 1e-5 \
    --wd 0.1 \
    --epochs 75 \
    --local-loss \
    --model ViT-B-32 \
    --pretrained "${PRETRAINED:-laion400m_e32}" \
    --prompt-template-setting sentence_1 \
    --use-fusion \
    --use-tagging \
    --resume "${RESUME:-}" \
    --load-tagging-only \
    "$@"
