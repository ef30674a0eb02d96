"""Model FLOPs/params profiler (reference open_clip_train/profiler.py:128-249).

Per-model GFLOPs / GMACs / Mparams for the image and text towers via XLA's
cost analysis (jit(...).lower(...).compile().cost_analysis()), CSV report,
'--model all' sweeps the registry.

Run: python -m xtagclip_tpu.cli.profiler --model ViT-B-32 [--results-file out.csv]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


def count_params(tree) -> int:
    return int(sum(x.size for x in jax.tree_util.tree_leaves(tree)))


def _flops_of(fn, *args) -> float:
    lowered = jax.jit(fn).lower(*args)
    try:
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        try:
            return float(lowered.cost_analysis()["flops"])
        except Exception:
            return float("nan")


def profile_model(model_name: str, batch_size: int = 1, force_custom_text=False):
    from xtagclip_tpu.factory import create_model

    bundle = create_model(model_name)
    module, params = bundle.module, bundle.params
    cfg = bundle.model_cfg
    image_size = cfg["vision_cfg"].get("image_size", 224)
    if isinstance(image_size, (list, tuple)):
        image_size = image_size[0]
    ctx = cfg["text_cfg"].get("context_length", 77)

    img = jnp.zeros((batch_size, image_size, image_size, 3), jnp.float32)
    txt = jnp.zeros((batch_size, ctx), jnp.int32)

    def image_fwd(params, img):
        return module.apply({"params": params}, img, True,
                            method=module.encode_image)[0]

    def text_fwd(params, txt):
        return module.apply({"params": params}, txt, True,
                            method=module.encode_text)[0]

    image_flops = _flops_of(image_fwd, params, img)
    text_flops = _flops_of(text_fwd, params, txt)

    vis_params = count_params(params.get("visual", {}))
    txt_params = count_params(params.get("text", {}))

    return {
        "model": model_name,
        "image_size": image_size,
        "image_width": cfg["vision_cfg"].get("width", 0),
        "text_width": cfg["text_cfg"].get("width", 0),
        "embed_dim": cfg["embed_dim"],
        "mparams": round(count_params(params) / 1e6, 2),
        "image_mparams": round(vis_params / 1e6, 2),
        "text_mparams": round(txt_params / 1e6, 2),
        "gflops": round((image_flops + text_flops) / 1e9 / batch_size, 2),
        "image_gflops": round(image_flops / 1e9 / batch_size, 2),
        "image_gmacs": round(image_flops / 2e9 / batch_size, 2),
        "text_gflops": round(text_flops / 1e9 / batch_size, 2),
        "text_gmacs": round(text_flops / 2e9 / batch_size, 2),
        # capacity planning (no reference analogue): bf16 params + 2x fp32
        # Adam moments, and the per-chip share under --fsdp on an 8-chip
        # slice (parallel/sharding.py rules)
        "train_state_gb": round(count_params(params) * 10.0 / 2 ** 30, 2),
        "fsdp8_gb_per_chip": round(
            _fsdp_share_bytes(params, 8) / 2 ** 30, 2),
    }


def _fsdp_share_bytes(params, n: int, bytes_per_param: float = 10.0) -> float:
    """Per-chip train-state bytes under the FSDP sharding rules on n chips."""
    from xtagclip_tpu.parallel.sharding import param_partition_spec

    total = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        spec = param_partition_spec(path, leaf, model_size=1, fsdp_size=n)
        shards = n if any(ax == "data" for ax in spec) else 1
        total += leaf.size * bytes_per_param / shards
    return total


def main(argv=None):
    p = argparse.ArgumentParser("profiler")
    p.add_argument("--model", type=str, default="ViT-B-32",
                   help="comma-separated model names, or 'all'")
    p.add_argument("--results-file", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=1)
    args = p.parse_args(argv)

    from xtagclip_tpu.factory import list_models

    if args.model == "all":
        names = list_models()
    else:
        names = [m.strip() for m in args.model.split(",") if m.strip()]

    rows = []
    for name in names:
        try:
            row = profile_model(name, batch_size=args.batch_size)
            rows.append(row)
            print(row)
        except Exception as e:  # registry sweep keeps going (reference :223)
            print(f"profile failed for {name}: {e}")

    if args.results_file and rows:
        import csv

        with open(args.results_file, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.results_file}")
    return rows


if __name__ == "__main__":
    main(sys.argv[1:])
