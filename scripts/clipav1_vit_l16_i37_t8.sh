#!/bin/bash
# CLIPA-v1 ViT-L/16 (image 37 tokens / text 8 tokens pretrain recipe) —
# evaluation entry (reference scripts/clipav1_vit_l16_i37_t8.sh).
#
# The reference pins model "ViT-L-16-CL32-GAP" (CLIPA-repo config: GAP-pooled
# vision tower, context-length-32 BPE text tower), which we ship in
# assets/model_configs/. Set CLIPA_V1_CKPT to the converted checkpoint.
set -e
python -m xtagclip_tpu.cli.main \
    --model ViT-L-16-CL32-GAP \
    --pretrained "${CLIPA_V1_CKPT:?set CLIPA_V1_CKPT to /path/to/clipa_vit_l16_i37_t8 checkpoint}" \
    --seed 0 \
    --imagenet-val "${IMAGENET_VAL:?set IMAGENET_VAL to /path/to/ImageNet/val}" \
    "$@"
