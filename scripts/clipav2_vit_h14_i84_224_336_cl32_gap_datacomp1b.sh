#!/bin/bash
# CLIPA-v2 ViT-H/14 (i84 -> 224 -> 336 schedule, datacomp1b) — evaluation at
# 336px (reference scripts/clipav2_vit_h14_i84_224_336_cl32_gap_datacomp1b.sh).
#
# Pins the 224->336 sequence-length-flexibility contract: --force-image-size
# re-interpolates the position embedding and re-jits at the new shape
# (SURVEY 5.7). The reference's --square-resize-only flag maps to
# --image-resize-mode squash (identical preprocessing: square resize, no crop).
set -e
python -m xtagclip_tpu.cli.main \
    --model ViT-H-14-CL32-GAP-BigVision \
    --pretrained "${CLIPA_V2_CKPT:?set CLIPA_V2_CKPT to /path/to/vit_h14_i84_224_336_cl32_gap_datacomp1b checkpoint}" \
    --force-image-size 336 \
    --image-resize-mode squash \
    --image-interpolation bilinear \
    --image-mean 0.485 0.456 0.406 \
    --image-std 0.229 0.224 0.225 \
    --seed 0 \
    --imagenet-val "${IMAGENET_VAL:?set IMAGENET_VAL to /path/to/ImageNet/val}" \
    "$@"
