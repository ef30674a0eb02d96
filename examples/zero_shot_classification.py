"""Zero-shot classification with a prompt-ensemble classifier.

The reference flow (zero_shot_classifier.py:21-68 + zero_shot.py:17-86):
encode every (template x class) prompt, mean over templates, L2-normalize
into a [D, C] weight matrix, then score images with 100 * img @ W.

Works offline with random-init weights; pass --pretrained for real ones
(e.g. laion400m_e32, or a local .pt / orbax checkpoint path).
"""
import argparse
import os
import sys

# runnable without installing the package: put the repo root on the path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# JAX_PLATFORMS=cpu alone does not stop TPU plugins that ignore the env var
# (e.g. the axon plugin); the config route always works
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

import xtagclip_tpu as xc
from xtagclip_tpu.train.metadata import SIMPLE_SCAR_TEMPLATES, SCAR_CLASSNAMES
from xtagclip_tpu.train.zero_shot import build_zero_shot_classifier


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--pretrained", default=None)
    ap.add_argument("--image", default=None, help="optional image file")
    args = ap.parse_args()

    if args.pretrained:
        bundle, _, preprocess = xc.create_model_and_transforms(
            args.model, pretrained=args.pretrained, precision="bf16")
    else:
        bundle, _, preprocess = xc.create_model_and_transforms(
            args.model, precision="bf16")
    tokenizer = xc.get_tokenizer(args.model)

    # [D, C] classifier from the scar class names + simple templates
    classifier = build_zero_shot_classifier(
        bundle.module, bundle.params, tokenizer,
        classnames=SCAR_CLASSNAMES,
        templates=SIMPLE_SCAR_TEMPLATES,
    )

    if args.image:
        from PIL import Image
        img = np.asarray(preprocess(Image.open(args.image).convert("RGB")))
        img = img[None]
    else:  # synthetic smoke input at the model's native resolution
        sz = bundle.model_cfg["vision_cfg"].get("image_size", 224)
        h, w = (sz, sz) if isinstance(sz, int) else sz
        img = np.random.default_rng(0).normal(size=(1, h, w, 3))
        img = img.astype(np.float32)

    out = bundle.encode_image(jnp.asarray(img))        # L2-normalized [1, D]
    # XTag CLIP returns (pooled, tokens); CoCa returns pooled only
    feats = out[0] if isinstance(out, tuple) else out
    logits = 100.0 * feats @ classifier                # [1, C]
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
    for name, p in sorted(zip(SCAR_CLASSNAMES, probs), key=lambda t: -t[1]):
        print(f"{p:6.3f}  {name}")


if __name__ == "__main__":
    main()
