"""Batch image/text feature extraction to an .npz archive.

The reference's `--save-embed` path (zero_shot_other.py:245-257) dumps
image/text embeddings + labels for the visualization tools; this is the
library-API version of the same flow.

Works offline: with no --image-dir it embeds synthetic images.
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

import jax.numpy as jnp
import numpy as np

import xtagclip_tpu as xc


def _pooled(out):
    # XTag CLIP returns (pooled, tokens); CoCa returns pooled only.
    # np.save cannot represent bfloat16 — export fp32.
    x = out[0] if isinstance(out, tuple) else out
    return np.asarray(x, dtype=np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--pretrained", default=None)
    ap.add_argument("--image-dir", default=None,
                    help="directory of images; synthetic batch if omitted")
    ap.add_argument("--texts", nargs="*",
                    default=["a photo of a hypertrophic scar",
                             "a photo of a keloid scar"])
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--out", default="embeddings.npz")
    args = ap.parse_args()

    kw = {"pretrained": args.pretrained} if args.pretrained else {}
    bundle, _, preprocess = xc.create_model_and_transforms(
        args.model, precision="bf16", **kw)
    tokenizer = xc.get_tokenizer(args.model)

    if args.image_dir:
        from PIL import Image
        names = sorted(
            n for n in os.listdir(args.image_dir)
            if n.lower().endswith((".jpg", ".jpeg", ".png", ".tif")))
        imgs = np.stack([
            np.asarray(preprocess(
                Image.open(os.path.join(args.image_dir, n)).convert("RGB")))
            for n in names])
    else:
        names = [f"synthetic_{i}" for i in range(args.batch_size)]
        sz = bundle.model_cfg["vision_cfg"].get("image_size", 224)
        h, w = (sz, sz) if isinstance(sz, int) else sz
        imgs = np.random.default_rng(0).normal(
            size=(args.batch_size, h, w, 3)).astype(np.float32)

    img_feats = []
    for i in range(0, len(imgs), args.batch_size):
        img_feats.append(_pooled(
            bundle.encode_image(jnp.asarray(imgs[i:i + args.batch_size]))))
    img_feats = np.concatenate(img_feats)

    txt_feats = _pooled(bundle.encode_text(jnp.asarray(tokenizer(args.texts))))

    np.savez(args.out, image_features=img_feats, text_features=txt_feats,
             image_names=np.array(names), texts=np.array(args.texts))
    print(f"wrote {args.out}: image {img_feats.shape}, text {txt_feats.shape}")


if __name__ == "__main__":
    main()
