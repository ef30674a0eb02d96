"""ResNet-50 supervised baseline (reference resnet50_baseline.py).

CNN classifier over scar/PathMNIST CSVs: torchvision-style ResNet-50 backbone
(2048-d GAP feature) + MLP head 2048 -> 512 -> 256 -> num_classes, CE loss,
early stopping (patience 15), macro P/R/F1 report, result plot
('scar_classifier_results.png'). Optional --pretrained loads a torchvision
resnet50 .pth via the converter (no hub downloads in this environment).

Run: python -m xtagclip_tpu.cli.baselines.resnet50_baseline --train-root ... --val-root ...
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
from xtagclip_tpu.models.standard_resnet import convert_torchvision_resnet, resnet50
from xtagclip_tpu.train.logger import setup_logging
from xtagclip_tpu.utils.constants import IMAGENET_MEAN, IMAGENET_STD


class ScarClassifier(nn.Module):
    """ResNet50 + MLP head (reference resnet50_baseline.py:190-215)."""

    num_classes: int = 3

    @nn.compact
    def __call__(self, images, additional=None, train: bool = False,
                 rng=None):
        feat = resnet50(name="backbone")(images, train=train)
        x = nn.Dense(512, name="head_fc1")(feat)
        x = nn.relu(x)
        x = nn.Dense(256, name="head_fc2")(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes, name="head_out")(x)


def main(argv=None):
    p = argparse.ArgumentParser("resnet50_baseline")
    p.add_argument("--train-root", required=True)
    p.add_argument("--val-root", required=True)
    p.add_argument("--train-csv", default=None)
    p.add_argument("--val-csv", default=None)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--patience", type=int, default=15)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--num-classes", type=int, default=3)
    p.add_argument("--pretrained", default=None,
                   help="local torchvision resnet50 .pth")
    p.add_argument("--output", default="scar_classifier_results.png")
    p.add_argument("--ckpt", default="best_resnet50_scar_model.pkl")
    args = p.parse_args(argv)
    setup_logging(None)

    pp = PreprocessCfg(size=args.image_size, mean=IMAGENET_MEAN,
                       std=IMAGENET_STD)
    train_ds = ScarClassificationDataset(
        args.train_root, args.train_csv, image_transform_train(pp),
        is_train=True,
    )
    val_ds = ScarClassificationDataset(
        args.val_root, args.val_csv, image_transform_eval(pp), is_train=False,
    )
    train_loader = DataLoader(train_ds, args.batch_size, shuffle=True,
                              drop_last=True, num_workers=4)
    val_loader = DataLoader(val_ds, args.batch_size, num_workers=4)

    model = ScarClassifier(num_classes=args.num_classes)
    dummy = jnp.zeros((1, args.image_size, args.image_size, 3))
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}

    if args.pretrained:
        import torch

        sd = torch.load(args.pretrained, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        bp, bs = convert_torchvision_resnet(
            {k: v.numpy() for k, v in sd.items()}
        )
        bp.pop("fc", None)
        params = dict(params)
        params["backbone"] = jax.tree.map(jnp.asarray, bp)
        extra = {"batch_stats": {"backbone": jax.tree.map(jnp.asarray, bs)}}
        logging.info("loaded torchvision weights from %s", args.pretrained)

    def apply_fn(params, extra, images, additional, train, rng):
        variables = {"params": params, **extra}
        if train:
            out, new_vars = model.apply(
                variables, images, additional, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng} if rng is not None else None,
            )
            return out, new_vars
        return model.apply(variables, images, additional, train=False)

    params, extra, history = train_supervised(
        apply_fn, params, extra, train_loader, val_loader, args.num_classes,
        lr=args.lr, num_epochs=args.epochs, patience=args.patience,
        ckpt_path=args.ckpt, mutable_stats=True,
    )
    metrics = evaluate_supervised(apply_fn, params, extra, val_loader,
                                  args.num_classes)
    logging.info("final metrics: %s", json.dumps(metrics, default=float))
    plot_history(history, args.output)
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
