"""Vanilla evaluation loop (reference open_clip_train/train.py:251-378):
val-set contrastive loss + cumulative R@{1,5,10} retrieval metrics +
zero-shot classification, feeding tensorboard/wandb sinks when enabled.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from xtagclip_tpu.utils import as_variables

from xtagclip_tpu.train.metrics import retrieval_metrics


def evaluate(module, params, data: Dict[str, Any], epoch: int, args,
             tokenizer=None, tb_writer=None) -> dict:
    metrics = {}
    from xtagclip_tpu.train.zero_shot import zero_shot_eval

    zs = zero_shot_eval(module, params, data, epoch, args, tokenizer)
    metrics.update(zs)

    if "val" in data and (
        args.val_frequency and ((epoch % args.val_frequency) == 0
                                or epoch == args.epochs)
    ):
        dataloader = data["val"].dataloader

        @jax.jit
        def forward(params, images, texts):
            variables = as_variables(params)
            img, _ = module.apply(
                variables, images, True, method=module.encode_image
            )
            txt, _ = module.apply(
                variables, texts, True, method=module.encode_text
            )
            scale = jnp.exp(variables["params"]["logit_scale"])
            return img, txt, scale

        all_img, all_txt = [], []
        total_loss = 0.0
        n = 0
        scale = 100.0
        for images, texts in dataloader:
            img, txt, scale = forward(
                params, jnp.asarray(images), jnp.asarray(texts)
            )
            all_img.append(np.asarray(img))
            all_txt.append(np.asarray(txt))
            logits = float(scale) * all_img[-1] @ all_txt[-1].T
            labels = np.arange(logits.shape[0])
            logp_i = logits - _logsumexp(logits, axis=1, keepdims=True)
            logp_t = logits.T - _logsumexp(logits.T, axis=1, keepdims=True)
            loss = -(logp_i[labels, labels].mean()
                     + logp_t[labels, labels].mean()) / 2
            total_loss += loss * logits.shape[0]
            n += logits.shape[0]

        img = np.concatenate(all_img)
        txt = np.concatenate(all_txt)
        metrics.update(retrieval_metrics(img, txt, float(scale)))
        metrics.update({
            "clip_val_loss": float(total_loss / max(n, 1)),
            "epoch": epoch,
            "num_samples": n,
        })

    if not metrics:
        return metrics
    logging.info("Eval Epoch: %d %s", epoch,
                 "\t".join(f"{k}: {round(v, 4) if isinstance(v, float) else v}"
                           for k, v in metrics.items()))

    log_base = getattr(args, "checkpoint_path", None)
    if log_base and getattr(args, "save_logs", True):
        results_file = os.path.join(os.path.dirname(log_base), "results.jsonl")
        try:
            with open(results_file, "a") as f:
                f.write(json.dumps(metrics, default=float) + "\n")
        except OSError:
            pass

    if tb_writer is not None:
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                tb_writer.add_scalar(f"val/{k}", v, epoch)
    return metrics


def _logsumexp(x, axis=None, keepdims=False):
    m = np.max(x, axis=axis, keepdims=True)
    out = m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))
    return out if keepdims else np.squeeze(out, axis=axis)
