"""Zero-shot classifier building + scar/medmnist/imagenet zero-shot eval.

Mirrors reference zero_shot_classifier.py:21-68 (batched template x class
encoding -> mean -> L2 -> [D, C] weights) and others/zero_shot_other.py:59-318
(run(): full-model forward per batch, logits = 100 * img @ W, top1/top2 +
per-class accuracy, grouped tag metrics, --save-embed dump, tagging-output
text artifact consumed by viz/ tools).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from xtagclip_tpu.utils import as_variables

from xtagclip_tpu.train import metadata
from xtagclip_tpu.train.metadata import format_template
from xtagclip_tpu.train.metrics import (
    accuracy_onehot,
    accuracy_topk,
    tag_batch_metrics,
    tags_to_binary,
)
from xtagclip_tpu.tokenize.prompts import tag_indices_to_words
from xtagclip_tpu.utils.assets import read_tag_list


def build_zero_shot_classifier(
    module,
    params,
    tokenizer,
    classnames: Sequence[str],
    templates: Sequence[str],
    num_classes_per_batch: Optional[int] = 10,
) -> jnp.ndarray:
    """Encode templates x classes -> mean over templates -> L2 -> [D, C]."""
    texts = [
        format_template(t, c) for c in classnames for t in templates
    ]
    tokens = jnp.asarray(tokenizer(texts))
    num_templates = len(templates)

    @jax.jit
    def encode(tokens):
        feats, _ = module.apply(
            as_variables(params), tokens, True, method=module.encode_text
        )
        return feats

    # batch over classes to bound memory (a single jit per chunk size)
    feats = []
    chunk = (num_classes_per_batch or len(classnames)) * num_templates
    for i in range(0, tokens.shape[0], chunk):
        feats.append(encode(tokens[i : i + chunk]))
    feats = jnp.concatenate(feats, axis=0)
    feats = feats.reshape(len(classnames), num_templates, -1).mean(axis=1)
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats.T.astype(jnp.float32)  # [D, C]


def build_zero_shot_classifier_legacy(
    module,
    params,
    tokenizer,
    classnames: Sequence[str],
    templates: Sequence[str],
) -> jnp.ndarray:
    """One-class-at-a-time variant (reference zero_shot_classifier.py:71-109):
    same output as build_zero_shot_classifier with per-class batching."""
    return build_zero_shot_classifier(
        module, params, tokenizer, classnames, templates,
        num_classes_per_batch=1,
    )


def _pick_classnames_templates(data_key: str):
    if "imagenet" in data_key.lower():
        return metadata.IMAGENET_CLASSNAMES, metadata.OPENAI_IMAGENET_TEMPLATES
    if "scar" in data_key.lower():
        return metadata.SCAR_CLASSNAMES, metadata.SIMPLE_SCAR_TEMPLATES
    if "pathmnist" in data_key.lower():
        return metadata.PATHMNIST_CLASSNAMES, metadata.SIMPLE_MEDICALMNIST_TEMPLATES
    if "medicalmnist" in data_key.lower():
        return metadata.MEDICALMNIST_CLASSNAMES, metadata.SIMPLE_MEDICALMNIST_TEMPLATES
    return metadata.IMAGENET_CLASSNAMES, metadata.OPENAI_IMAGENET_TEMPLATES


def make_eval_forward(module, fusion_scoring: bool = False, extra_vars=None):
    """The jitted eval/serving forward shared by run_scar_eval and
    cli.predict: encode_image -> tag head -> zero-shot logits (100*img@W) or
    the fusion-aware token-mix similarity (train_other_simple.py:442-455).

    Returns fn(params, images, classifier[D, C]) ->
    (img_feat, logits, tag_global)."""
    extra = dict(extra_vars or {})

    def _l2(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-12)

    @jax.jit
    def forward(params, images, classifier):
        variables = {**as_variables(params), **extra}
        img_feat, tokens = module.apply(
            variables, images, True, method=module.encode_image
        )
        tag_logits = module.apply(
            variables, tokens, method=module.tag_forward
        )
        _, tag_global = module.apply(
            variables, tag_logits,
            method=lambda m, x: m.prepare_tag_indices(x),
        )
        if fusion_scoring:
            g_sim = _l2(tokens.mean(axis=1)) @ classifier
            l_sim = (_l2(tokens) @ classifier).mean(axis=1)
            logits = 100.0 * (g_sim + l_sim) / 2.0
        else:
            logits = 100.0 * img_feat @ classifier
        return img_feat, logits, tag_global

    return forward


def run_scar_eval(
    module,
    params,
    classifier: jnp.ndarray,
    dataloader,
    prompt_table=None,
    save_embed: bool = False,
    save_embed_path: Optional[str] = None,
    tagging_output_path: Optional[str] = None,
    class_output_path: Optional[str] = None,
    classnames: Optional[Sequence[str]] = None,
    fusion_scoring: bool = False,
):
    """Eval loop over a Scar-style loader (image, label, additional, tokens,
    class_word, class_idx). Returns metrics dict.

    prompt_table is accepted for call-site symmetry with the train step but
    unused: classification logits are 100*img@W and tag metrics come from
    tag_logits — the reference eval's pseudo-prompt text pass contributes to
    neither (zero_shot_other.py:59-261), so the jitted eval forward skips it.

    fusion_scoring applies the fusion-aware similarity
    (train_other_simple.py:442-455): 100 * (cos(mean_tokens, W) +
    mean_over_tokens cos(token_l, W)) / 2 — pure jnp on device, replacing the
    reference's sklearn-on-CPU path.
    """
    tag_list = read_tag_list()
    _fwd = make_eval_forward(module, fusion_scoring=fusion_scoring)

    def forward(params, images):
        return _fwd(params, images, classifier)

    n = 0
    top1 = top2 = 0.0
    class_counts = None
    class_correct1 = None
    all_img_feats = []
    all_labels = []
    tag_lines = []
    class_lines = []
    tag_metric_accum = []

    for batch in dataloader:
        images, label_vec, additional, _tokens, class_words, _cidx = batch
        img_feat, logits, tag_global = forward(params, jnp.asarray(images))
        logits = np.asarray(logits)
        overall, counts, correct = accuracy_onehot(
            logits, np.asarray(label_vec), topk=(1, 2)
        )
        top1 += overall[0]
        top2 += overall[1]
        class_counts = counts if class_counts is None else class_counts + counts
        c1 = correct[1]
        class_correct1 = c1 if class_correct1 is None else class_correct1 + c1
        n += logits.shape[0]

        pred_binary = tags_to_binary(np.asarray(tag_global))
        m = tag_batch_metrics(np.asarray(additional), pred_binary)
        tag_metric_accum.append((logits.shape[0], m))

        pred_words = tag_indices_to_words(np.asarray(tag_global), tag_list)
        gt_words = [
            ",".join(tag_list[i] for i in np.nonzero(row)[0])
            for row in np.asarray(additional)
        ]
        tag_lines.extend(f"{g} - {p}" for g, p in zip(gt_words, pred_words))

        if class_output_path:
            names = list(classnames or [str(i) for i in
                                        range(logits.shape[1])])
            for row_logits, row_label in zip(logits, np.asarray(label_vec)):
                gt_name = names[int(np.argmax(row_label))]
                pred_name = names[int(np.argmax(row_logits))]
                scores = ", ".join(f"{s:.6f}" for s in row_logits.tolist())
                class_lines.append(f"{gt_name} - {pred_name} - [{scores}]")

        if save_embed:
            all_img_feats.append(np.asarray(img_feat))
            all_labels.append(np.asarray(label_vec))

    def wavg(key_path):
        tot = sum(b for b, _ in tag_metric_accum)
        val = sum(b * _dig(m, key_path) for b, m in tag_metric_accum)
        return val / max(tot, 1)

    def _dig(d, path):
        for p in path:
            d = d[p]
        return d

    metrics = {
        "top1": top1 / max(n, 1),
        "top2": top2 / max(n, 1),
        "n": n,
        "per_class_acc": (
            (class_correct1 / np.maximum(class_counts, 1)).tolist()
            if class_counts is not None else []
        ),
        "tag_accuracy": wavg(("accuracy",)),
        "tag_precision": wavg(("precision",)),
        "tag_recall": wavg(("recall",)),
        "tag_f1": wavg(("f1",)),
    }
    for g in ["Width", "Color", "Pigmentation", "Surface", "Irregular Color",
              "Irregular Height"]:
        metrics[f"tag_{g.lower().replace(' ', '_')}_f1"] = wavg(
            ("groups", g, "f1")
        )

    if class_output_path and class_lines:
        with open(class_output_path, "w") as f:
            f.write("\n".join(class_lines) + "\n")
            f.write(f"\n전체 정확도: {metrics['top1']:.4f}\n")

    if tagging_output_path:
        with open(tagging_output_path, "w") as f:
            f.write("\n".join(tag_lines) + "\n")
            f.write(f"\n전체 태그 정확도: {metrics['tag_accuracy']:.4f}\n")
            f.write(f"정밀도: {metrics['tag_precision']:.4f} "
                    f"재현율: {metrics['tag_recall']:.4f} "
                    f"F1: {metrics['tag_f1']:.4f}\n")

    if save_embed and all_img_feats:
        img = np.concatenate(all_img_feats)
        labels = np.concatenate(all_labels)
        txt = np.asarray(classifier.T)
        path = save_embed_path or "dataset_embeddings.npz"
        np.savez(path, img_embeddings=img, txt_embeddings=txt, labels=labels)
        try:  # also emit the reference's .pt layout for the viz tools
            import torch

            torch.save(
                {
                    "img_embeddings": torch.from_numpy(img),
                    "txt_embeddings": torch.from_numpy(txt),
                    "labels": torch.from_numpy(labels),
                    "dataset_labels": list(classnames or []),
                },
                os.path.splitext(path)[0] + ".pt",
            )
        except ImportError:
            pass
        logging.info("saved embeddings to %s (%s images)", path, len(img))

    return metrics


def run_classification_eval(module, params, classifier, dataloader):
    """Plain (image, int_label) eval: top1/top5 counts / n."""

    @jax.jit
    def forward(params, images):
        feats, _ = module.apply(
            as_variables(params), images, True, method=module.encode_image
        )
        return 100.0 * feats @ classifier

    n = 0
    top1 = top5 = 0.0
    for images, target in dataloader:
        logits = np.asarray(forward(params, jnp.asarray(images)))
        k = min(5, logits.shape[1])
        accs = accuracy_topk(logits, np.asarray(target), topk=(1, k))
        top1 += accs[0]
        top5 += accs[1]
        n += logits.shape[0]
    return {"top1": top1 / max(n, 1), "top5": top5 / max(n, 1), "n": n}


def train_data_eval(module, params, data: dict, args, tokenizer,
                    prompt_table=None) -> dict:
    """Validation pass over the TRAIN split (reference train_other.py:290-496,
    every epoch; train_other_simple.py:355-582, every 10 epochs): top1/top2,
    per-class accuracy, grouped tag metrics, and the
    traindata_val_{tagging,class}_output.txt artifacts the viz tools consume.
    The returned top1 drives the 'train_top1' best checkpoint."""
    if "scar_train" not in data:
        return {}
    classnames, templates = _pick_classnames_templates("scar_train")
    classifier = build_zero_shot_classifier(
        module, params, tokenizer, classnames, templates
    )
    tag_txt = cls_txt = None
    if getattr(args, "checkpoint_path", None):
        tag_txt = os.path.join(
            args.checkpoint_path, "traindata_val_tagging_output.txt"
        )
        cls_txt = os.path.join(
            args.checkpoint_path, "traindata_val_class_output.txt"
        )
    m = run_scar_eval(
        module, params, classifier, data["scar_train"].dataloader,
        prompt_table=prompt_table,
        tagging_output_path=tag_txt,
        class_output_path=cls_txt,
        classnames=classnames,
        fusion_scoring=getattr(args, "use_fusion", False),
    )
    return {f"train_data-{k}": v for k, v in m.items()}


def zero_shot_eval(module, params, data: dict, epoch: int, args, tokenizer,
                   prompt_table=None) -> dict:
    """Dispatch over eval splits (reference zero_shot_other.py:263-318)."""
    results = {}
    # NOTE: the generic "val" split is caption pairs (retrieval metrics in
    # evaluate(), reference train.py:251-358) — zero-shot CLASSIFICATION only
    # runs on labeled splits (reference zero_shot.py:17-86 / zero_shot_other)
    for key in ("scar_val", "PathMNIST_val", "MedicalMNIST", "imagenet-val",
                "imagenet-v2"):
        if key not in data:
            continue
        classnames, templates = _pick_classnames_templates(key)
        classifier = build_zero_shot_classifier(
            module, params, tokenizer, classnames, templates
        )
        if key == "scar_val":
            out_txt = cls_txt = None
            if getattr(args, "checkpoint_path", None):
                out_txt = os.path.join(
                    args.checkpoint_path, "val_data_tagging_output.txt"
                )
                cls_txt = os.path.join(
                    args.checkpoint_path, "val_data_class_output.txt"
                )
            m = run_scar_eval(
                module, params, classifier, data[key].dataloader,
                prompt_table=prompt_table,
                save_embed=getattr(args, "save_embed", False),
                save_embed_path=(
                    f"dataset_embeddings_all_no_templete_{args.name}.npz"
                    if getattr(args, "name", None) else None
                ),
                tagging_output_path=out_txt,
                class_output_path=cls_txt,
                classnames=classnames,
                fusion_scoring=getattr(args, "use_fusion", False),
            )
            results.update({f"{key}-{k}": v for k, v in m.items()})
        else:
            m = run_classification_eval(
                module, params, classifier, data[key].dataloader
            )
            results.update({f"{key}-{k}": v for k, v in m.items()})
    return results
