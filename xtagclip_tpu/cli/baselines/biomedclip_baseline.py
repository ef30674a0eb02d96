"""BiomedCLIP fine-tune baseline (reference biomedclip_baseline.py).

Same fusion-head pattern as clip_baseline, with the BiomedCLIP towers
(timm ViT-B/16 image + PubMedBERT text) and the --lock-text-encoder switch
(reference Config: bs 4, lr 5e-6, wd 1e-4, 100 epochs, patience 5; best model
saved to best_biomedclip_scar_model.*). Like the reference's 3-deep fallback
loader ladder, an unresolvable pretrained tag degrades to random init with a
warning instead of failing.

Run: python -m xtagclip_tpu.cli.baselines.biomedclip_baseline --train-root ... --val-root ...
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

import jax

from xtagclip_tpu.cli.baselines.clip_baseline import build_classifier
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
from xtagclip_tpu.train.logger import setup_logging

DEFAULT_MODEL = "BiomedCLIP-PubMedBERT_256-vit_base_patch16_224"


def main(argv=None):
    p = argparse.ArgumentParser("biomedclip_baseline")
    p.add_argument("--train-root", required=True)
    p.add_argument("--val-root", required=True)
    p.add_argument("--train-csv", default=None)
    p.add_argument("--val-csv", default=None)
    p.add_argument("--model", default=DEFAULT_MODEL)
    p.add_argument("--pretrained", default=None,
                   help="local BiomedCLIP open_clip checkpoint")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=5e-6)
    p.add_argument("--wd", type=float, default=1e-4)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--num-classes", type=int, default=3)
    p.add_argument("--lock-text-encoder", action="store_true", default=False)
    p.add_argument("--lock-image", action="store_true", default=False)
    p.add_argument("--output", default="biomedclip_classifier_results.png")
    p.add_argument("--ckpt", default="best_biomedclip_scar_model.pkl")
    args = p.parse_args(argv)
    setup_logging(None)

    try:
        model, params, extra, img_size = build_classifier(
            args.model, args.pretrained, args.num_classes, args.lock_image
        )
    except Exception as e:  # fallback ladder (biomedclip_baseline.py:216-374)
        logging.warning("BiomedCLIP build failed (%s); falling back to "
                        "ViT-B-32 random init", e)
        model, params, extra, img_size = build_classifier(
            "ViT-B-32", None, args.num_classes, args.lock_image
        )

    # text tower is unused by the classifier head; --lock-text-encoder is
    # honoured by excluding any text params from the trainable set
    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: not (
            (args.lock_image and "visual" in jax.tree_util.keystr(path))
            or (args.lock_text_encoder and "text" in jax.tree_util.keystr(path))
        ),
        params,
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
