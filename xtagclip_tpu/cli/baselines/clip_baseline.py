"""OpenCLIP fine-tune baseline (reference clip_baseline.py).

CLIPScarClassifier: CLIP image tower (default ViT-B-32, optionally frozen) +
attribute MLP (22 -> 128, ReLU, dropout 0.3) fused with the image feature into
512 -> 256 -> num_classes (dropouts 0.5/0.3), CE loss, early stopping
(patience 5), lr 5e-6, wd 1e-4, batch 4 — the reference Config
(clip_baseline.py:106-123).

Run: python -m xtagclip_tpu.cli.baselines.clip_baseline --train-root ... --val-root ...
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xtagclip_tpu.cli.baselines.common import (
    ScarClassificationDataset,
    evaluate_supervised,
    plot_history,
    train_supervised,
)
from xtagclip_tpu.data.loader import DataLoader
from xtagclip_tpu.data.transforms import (
    PreprocessCfg,
    image_transform_eval,
    image_transform_train,
)
from xtagclip_tpu.factory import create_model
from xtagclip_tpu.train.logger import setup_logging


class FusionHead(nn.Module):
    """[img_feat ⊕ MLP(22-dim attrs)] -> MLP -> classes
    (clip_baseline.py:273-408 / biomedclip_baseline.py:376-392)."""

    num_classes: int = 3

    @nn.compact
    def __call__(self, img_feat, additional, train: bool = False):
        a = nn.Dense(128, name="additional_fc")(additional)
        a = nn.relu(a)
        a = nn.Dropout(0.3)(a, deterministic=not train)
        x = jnp.concatenate([img_feat, a], axis=-1)
        x = nn.Dense(512, name="fusion_fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5)(x, deterministic=not train)
        x = nn.Dense(256, name="fusion_fc2")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.3)(x, deterministic=not train)
        return nn.Dense(self.num_classes, name="fusion_out")(x)


def build_classifier(model_name: str, pretrained, num_classes: int,
                     lock_image: bool):
    bundle = create_model(model_name, pretrained=pretrained)

    class Classifier(nn.Module):
        # module-typed field: linen binds it as a child named "visual", so
        # the param tree carries params["visual"] that the CLIP-tower
        # overwrite below can target
        visual: nn.Module

        @nn.compact
        def __call__(self, images, additional, train: bool = False):
            feat, _ = self.visual(images, deterministic=not train)
            if lock_image:
                feat = jax.lax.stop_gradient(feat)
            return FusionHead(num_classes=num_classes, name="head")(
                feat, additional, train=train
            )

    model = Classifier(visual=bundle.module.visual.clone())
    img_size = bundle.model_cfg["vision_cfg"].get("image_size", 224)
    dummy_i = jnp.zeros((1, img_size, img_size, 3))
    dummy_a = jnp.zeros((1, 22))
    variables = model.init(jax.random.PRNGKey(0), dummy_i, dummy_a)
    params = dict(variables["params"])
    # overwrite the vision tower with the (possibly pretrained) CLIP weights
    params["visual"] = bundle.params["visual"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    return model, params, extra, img_size


def main(argv=None):
    p = argparse.ArgumentParser("clip_baseline")
    p.add_argument("--train-root", required=True)
    p.add_argument("--val-root", required=True)
    p.add_argument("--train-csv", default=None)
    p.add_argument("--val-csv", default=None)
    p.add_argument("--model", default="ViT-B-32")
    p.add_argument("--pretrained", default=None,
                   help="local open_clip checkpoint (e.g. laion400m_e32 .pt)")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=5e-6)
    p.add_argument("--wd", type=float, default=1e-4)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--num-classes", type=int, default=3)
    p.add_argument("--lock-image", action="store_true", default=False)
    p.add_argument("--output", default="clip_classifier_results.png")
    p.add_argument("--ckpt", default="best_clip_scar_model.pkl")
    args = p.parse_args(argv)
    setup_logging(None)

    model, params, extra, img_size = build_classifier(
        args.model, args.pretrained, args.num_classes, args.lock_image
    )
    pp = PreprocessCfg(size=img_size)
    train_ds = ScarClassificationDataset(
        args.train_root, args.train_csv, image_transform_train(pp), True
    )
    val_ds = ScarClassificationDataset(
        args.val_root, args.val_csv, image_transform_eval(pp), False
    )
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True,
                              drop_last=True, num_workers=4)
    val_loader = DataLoader(val_ds, args.batch_size, num_workers=4)

    mask = None
    if args.lock_image:
        mask = jax.tree_util.tree_map_with_path(
            lambda path, _: jax.tree_util.keystr(path).find("visual") < 0,
            params,
        )

    def apply_fn(params, extra, images, additional, train, rng):
        return model.apply(
            {"params": params, **extra}, images, additional, train=train,
            rngs={"dropout": rng} if (train and rng is not None) else None,
        )

    params, extra, history = train_supervised(
        apply_fn, params, extra, train_loader, val_loader, args.num_classes,
        lr=args.lr, weight_decay=args.wd, num_epochs=args.epochs,
        patience=args.patience, trainable_mask=mask, ckpt_path=args.ckpt,
    )
    metrics = evaluate_supervised(apply_fn, params, extra, val_loader,
                                  args.num_classes)
    logging.info("final metrics: %s", json.dumps(metrics, default=float))
    plot_history(history, args.output)
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
