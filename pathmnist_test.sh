#!/bin/bash
# PathMNIST eval-only with embedding export (reference pathmnist_test.sh).
set -e
python -m xtagclip_tpu.cli.main_other \
    --batch-size 1 \
    --force-image-size 224 \
    --name "${RUN_NAME:-Scar_ViT-B-32_laion400m_e32_9}" \
    --val-data "${PATHMNIST_VAL:-}" \
    --model ViT-B-32 \
    --pretrained "${PRETRAINED:-laion400m_e32}" \
    --save-embed \
    "$@"
