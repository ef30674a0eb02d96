"""The full XTag inference path as ONE jitted device program.

Flow (reference model.py:488-586, but with zero host/device syncs):
  encode image -> tag head (44 label queries) -> per-category argmax ->
  pseudo-prompt LOOKUP from a pre-tokenized table (jnp.take; the reference
  re-tokenizes on host inside forward()) -> text tower over the 77-token
  prompts -> TQN fusion logits in both directions.

Works offline with random-init weights; use --pretrained for real ones.
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
from xtagclip_tpu.models.clip import num_combos
from xtagclip_tpu.tokenize.prompts import PromptTable
from xtagclip_tpu.train.metadata import SCAR_CLASSNAMES


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--pretrained", default=None)
    ap.add_argument("--batch-size", type=int, default=4)
    args = ap.parse_args()

    kw = {"pretrained": args.pretrained} if args.pretrained else {}
    bundle, _, preprocess = xc.create_model_and_transforms(
        args.model, precision="bf16", use_tagging=True, use_fusion=True,
        prompt_template_setting="sentence_1", **kw)
    tokenizer = xc.get_tokenizer(args.model)

    # Pre-tokenized pseudo-prompt table [templates, classes, combos, ctx].
    # Built ONCE on host; the forward picks rows with jnp.take on device.
    table = jnp.asarray(
        PromptTable(list(SCAR_CLASSNAMES), tokenizer=tokenizer).table)
    print(f"prompt table: {table.shape} ({num_combos()} tag combos)")

    B = args.batch_size
    sz = bundle.model_cfg["vision_cfg"].get("image_size", 224)
    h, w = (sz, sz) if isinstance(sz, int) else sz
    imgs = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, h, w, 3)).astype(np.float32))
    class_ids = jnp.zeros((B,), jnp.int32)  # scored against class 0's prompts

    @jax.jit
    def infer(params, imgs, table, class_ids):
        # bundle.apply threads extra_variables (BatchNorm batch_stats on
        # ResNet towers) alongside the params
        return bundle.apply(imgs, None, table, class_ids, 0, True,
                            params=params)

    out = infer(bundle.params, imgs, table, class_ids)
    print("tag_logits:", out["tag_logits"].shape)       # [B, 44]
    print("tag_indices:", np.asarray(out["tag_indices"])[0])  # 6 picked tags
    print("fusion i2t:", out["i2t_cls"].shape, "t2i:", out["t2i_cls"].shape)


if __name__ == "__main__":
    main()
