"""Batch inference CLI: images in, class/tag predictions out (JSONL).

The serving-side counterpart of the eval loops: the reference can only
score images through its dataset-bound eval paths (zero_shot_other.py
needs a labeled loader); this entry point classifies ad-hoc inputs — a
directory, a CSV, or explicit files — with any registry model + checkpoint,
using the same jitted forward as `train/zero_shot.py::run_scar_eval`
(prompt-ensemble classifier, optional tag head, optional fusion-aware
token scoring from the reference's train_other_simple.py:442-455).

    python -m xtagclip_tpu.cli.predict \
        --model ViT-B-32 --pretrained /path/ckpt.pt \
        --input /dir/of/images --dataset scar --use-tagging \
        --output predictions.jsonl

One compiled program serves every batch: the last batch is zero-padded to
the static batch size and the padding rows are dropped on host.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _parse_args(argv=None):
    p = argparse.ArgumentParser("xtagclip_tpu prediction")
    p.add_argument("--model", default="ViT-B-32")
    p.add_argument("--pretrained", default=None,
                   help="pretrained tag, local .pt/.npz, or hf-hub: id")
    p.add_argument("--resume", default=None,
                   help="checkpoint to load on top (orbax dir or .pt)")
    p.add_argument("--input", nargs="+", required=True,
                   help="image files, a directory, or a .csv")
    p.add_argument("--csv-img-key", default="filepath")
    p.add_argument("--dataset", default="scar",
                   choices=("scar", "pathmnist", "medicalmnist", "imagenet"),
                   help="class-name/template set for the zero-shot head")
    p.add_argument("--classnames", default=None,
                   help="comma-separated override of --dataset class names")
    p.add_argument("--template", default=None,
                   help="prompt template override, e.g. 'a photo of {}.'")
    p.add_argument("--use-tagging", action="store_true",
                   help="emit the 6 per-category tag picks (XTag head)")
    p.add_argument("--fusion-scoring", action="store_true",
                   help="token-mix similarity (train_other_simple.py:442-455)")
    p.add_argument("--fusion-classify", action="store_true",
                   help="classify via TQN fusion over the precomputed "
                        "pseudo-prompt space (serving.py; implies "
                        "--use-tagging)")
    p.add_argument("--prompt-template-setting", default="sentence_1",
                   help="template for --fusion-classify")
    p.add_argument("--serving-artifact", default=None,
                   help="run --fusion-classify from an AOT serving artifact "
                        "dir (convert/serving.py serve_classify entry): no "
                        "model code or checkpoint is loaded — weights and "
                        "the prompt table are baked into the StableHLO blob")
    p.add_argument("--export-serving", default=None,
                   help="with --fusion-classify: write the AOT artifact "
                        "(encode_image/encode_text/forward + serve_classify "
                        "with the precomputed prompt table baked in) to this "
                        "dir before predicting")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--output", default="-",
                   help="JSONL path ('-' = stdout)")
    p.add_argument("--save-embed", default=None,
                   help="optional .npz with fp32 image features")
    return p.parse_args(argv)


def _list_inputs(args):
    names = []
    for item in args.input:
        if os.path.isdir(item):
            exts = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif",
                    ".tiff", ".ppm", ".pgm")
            names.extend(
                os.path.join(item, n) for n in sorted(os.listdir(item))
                if n.lower().endswith(exts))
        elif item.lower().endswith(".csv"):
            import csv

            with open(item, newline="") as f:
                for i, row in enumerate(csv.DictReader(f)):
                    if args.csv_img_key not in row:
                        raise SystemExit(
                            f"predict: {item} row {i + 1} has no "
                            f"'{args.csv_img_key}' column (columns: "
                            f"{sorted(row)}); set --csv-img-key")
                    names.append(row[args.csv_img_key])
        else:
            names.append(item)
    if not names:
        raise SystemExit("predict: no input images found")
    return names


def _class_meta(args):
    from xtagclip_tpu.train import metadata as M

    table = {
        "scar": (M.SCAR_CLASSNAMES, M.SIMPLE_SCAR_TEMPLATES),
        "pathmnist": (M.PATHMNIST_CLASSNAMES, M.SIMPLE_MEDICALMNIST_TEMPLATES),
        "medicalmnist": (M.MEDICALMNIST_CLASSNAMES,
                         M.SIMPLE_MEDICALMNIST_TEMPLATES),
        "imagenet": (M.IMAGENET_CLASSNAMES, M.OPENAI_IMAGENET_TEMPLATES),
    }
    classnames, templates = table[args.dataset]
    if args.classnames:
        classnames = [c.strip() for c in args.classnames.split(",")]
    if args.template:
        templates = [args.template]
    return list(classnames), list(templates)


def main(argv=None):
    args = _parse_args(argv)

    import jax
    import jax.numpy as jnp

    from xtagclip_tpu.factory import (
        create_model_and_transforms,
        get_tokenizer,
        load_checkpoint,
    )
    from xtagclip_tpu.train.zero_shot import build_zero_shot_classifier
    from xtagclip_tpu.utils.assets import read_tag_list

    names = _list_inputs(args)
    classnames, templates = _class_meta(args)

    if args.fusion_classify:
        args.use_tagging = True

    serve = None
    bundle = None
    if args.serving_artifact:
        # deploy-from-artifact: the entire 9.5k img/s precomputed-prompt
        # pipeline (vision tower -> tag head -> prompt-table gather -> TQN
        # fusion) runs from the serialized StableHLO blob; neither the model
        # code nor the checkpoint is touched. The manifest carries the host
        # preprocess recipe (resize/crop to uint8; normalize is in-graph).
        if not args.fusion_classify:
            raise SystemExit("--serving-artifact requires --fusion-classify")
        import dataclasses

        from xtagclip_tpu.convert.serving import load_serving, read_manifest
        from xtagclip_tpu.data.transforms import (
            PreprocessCfg,
            image_transform_eval,
        )

        fns = load_serving(args.serving_artifact)
        if "serve_classify" not in fns:
            raise SystemExit(
                f"{args.serving_artifact} has no serve_classify entry — "
                "export it with --export-serving under --fusion-classify")
        manifest = read_manifest(args.serving_artifact)
        pp = manifest.get("preprocess") or {}
        fields = {f.name for f in dataclasses.fields(PreprocessCfg)}
        cfg = PreprocessCfg(**{k: v for k, v in pp.items() if k in fields})
        preprocess = image_transform_eval(cfg, normalize_host=False)
        classnames = manifest.get("classnames") or classnames
        _classify = fns["serve_classify"]
        serve = lambda _params, images: _classify(images)  # noqa: E731
    else:
        kw = {"pretrained": args.pretrained} if args.pretrained else {}
        bundle, _, preprocess = create_model_and_transforms(
            args.model, precision=args.precision,
            use_tagging=args.use_tagging, use_fusion=args.fusion_classify,
            **kw)
        if args.resume:
            load_checkpoint(bundle, args.resume)
    tokenizer = None if bundle is None else get_tokenizer(args.model)

    if args.fusion_classify and bundle is not None:
        from xtagclip_tpu.serving import (
            make_xtag_serve_step,
            precompute_prompt_features,
        )
        from xtagclip_tpu.tokenize.prompts import PromptTable

        # build + embed only the requested template's prompt rows
        ptable = PromptTable(classnames, tokenizer=tokenizer,
                             templates=[args.prompt_template_setting]).table
        feats_table = precompute_prompt_features(bundle, ptable,
                                                 template_id=0)
        if args.export_serving:
            from xtagclip_tpu.convert.serving import save_serving

            manifest = save_serving(
                bundle, args.export_serving, model_name=args.model,
                serve_classify_table=feats_table, classnames=classnames)
            sizes = ", ".join("{}={:.1f}MB".format(k, v["bytes"] / 1e6)
                              for k, v in manifest["entries"].items())
            print(f"wrote serving artifact: {args.export_serving} ({sizes})")
        serve = make_xtag_serve_step(bundle, feats_table)

    classifier = None
    forward = None
    if serve is None:
        from xtagclip_tpu.train.zero_shot import make_eval_forward

        # the zero-shot [D, C] head is dead weight under --fusion-classify
        classifier = build_zero_shot_classifier(
            bundle.module, bundle.params, tokenizer,
            classnames=classnames, templates=templates)
        forward = make_eval_forward(  # shared with run_scar_eval
            bundle.module, fusion_scoring=args.fusion_scoring,
            extra_vars=bundle.extra_variables)

    tag_list = read_tag_list()

    from PIL import Image

    out = sys.stdout if args.output == "-" else open(args.output, "w")
    bs = args.batch_size
    all_feats = [] if args.save_embed else None
    try:
        for start in range(0, len(names), bs):
            chunk = names[start:start + bs]
            imgs = np.stack([
                np.asarray(preprocess(Image.open(n).convert("RGB")))
                for n in chunk])
            if len(chunk) < bs:  # static shapes: pad, then drop on host
                pad = np.zeros((bs - len(chunk),) + imgs.shape[1:],
                               imgs.dtype)
                imgs = np.concatenate([imgs, pad])
            if serve is not None:
                feats, tag_global, logits = serve(
                    None if bundle is None else bundle.params,
                    jnp.asarray(imgs))
            else:
                feats, logits, tag_global = forward(
                    bundle.params, jnp.asarray(imgs), classifier)
            logits = np.asarray(logits, np.float32)[:len(chunk)]
            probs = np.exp(logits - logits.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            if all_feats is not None:
                all_feats.append(
                    np.asarray(feats, np.float32)[:len(chunk)])
            tags = None
            if args.use_tagging:
                tags = np.asarray(tag_global)[:len(chunk)]
            for j, name in enumerate(chunk):
                rec = {
                    "image": name,
                    "class": classnames[int(logits[j].argmax())],
                    "probs": {c: round(float(p), 4)
                              for c, p in zip(classnames, probs[j])},
                }
                if tags is not None:
                    rec["tags"] = [tag_list[t] for t in tags[j]]
                out.write(json.dumps(rec) + "\n")
    finally:
        if out is not sys.stdout:
            out.close()
    if out is not sys.stdout:
        print(f"wrote {args.output} ({len(names)} predictions)")
    if all_feats is not None:
        np.savez(args.save_embed,
                 image_features=np.concatenate(all_feats),
                 image_names=np.array(names))
        print(f"wrote {args.save_embed}")


if __name__ == "__main__":
    main()
