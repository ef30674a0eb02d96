"""On-chip A/B: ViT-H-14 eval rate with the fused block kernel on vs off.

Round 4's bench showed the whole ViT-H family ~7% slower than round 3 with
identical bench config (372.0 -> 346.5 img/s @224) while ViT-L stayed flat —
right after a large round of fused_attn_block changes. This probe reruns the
exact bench methodology (bench.py tower_rate: chained-scan classify over
uint8 input) per tower with XTAG_FUSED_BLOCK toggled, so the delta is
attributed to the kernel path vs the environment.

Run: python tools/probe_vith_ab.py [model ...]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tower_rate(model_name, lbatch, k, image_size=None, no_cls=False):
    import jax
    import jax.numpy as jnp

    from xtagclip_tpu.factory import create_model
    from xtagclip_tpu.ops.preprocess import normalize_images

    rng = np.random.default_rng(0)
    lb = create_model(model_name, precision="bf16",
                      force_image_size=image_size, scan_layers=True,
                      skip_init=True,
                      **({"vision_cfg": {"no_class_token": True}}
                         if no_cls else {}))
    dev = jax.devices()[0]
    ctx = lb.model_cfg["text_cfg"].get("context_length", 77)
    with jax.default_device(dev):
        variables = jax.jit(
            lb.module.init, static_argnames=("deterministic",))(
            jax.random.PRNGKey(0),
            jnp.zeros((1, image_size or lb.model_cfg["vision_cfg"][
                "image_size"], image_size or lb.model_cfg["vision_cfg"][
                "image_size"], 3), jnp.bfloat16),
            jnp.zeros((1, ctx), jnp.int32), deterministic=True)
    lparams = variables["params"]
    size = image_size or lb.model_cfg["vision_cfg"].get("image_size", 224)
    lcw = jnp.asarray(rng.standard_normal(
        (9, lb.model_cfg["embed_dim"]), dtype=np.float32), jnp.bfloat16)

    def lclassify(p, images_u8, cw, salt):
        x = normalize_images(images_u8, dtype=jnp.bfloat16) + salt
        feats, _ = lb.module.apply({"params": p}, x, True,
                                   method=lb.module.encode_image)
        return jnp.argmax(100.0 * jnp.matmul(
            feats, cw.T, preferred_element_type=jnp.float32), axis=-1)

    def lchained(p, images_u8, cw):
        def body(carry, _):
            out = lclassify(p, images_u8, cw,
                            carry.astype(jnp.bfloat16) * 1e-9)
            return out.sum().astype(jnp.float32), out[0]
        _, outs = jax.lax.scan(body, jnp.float32(0), jnp.arange(k))
        return outs

    lfn = jax.jit(lchained)
    lx = jax.device_put(rng.integers(
        0, 256, size=(lbatch, size, size, 3)).astype(np.uint8), dev)
    np.asarray(lfn(lparams, lx, lcw))  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(lfn(lparams, lx, lcw))
        best = min(best, time.perf_counter() - t0)
    return lbatch * k / best


def main():
    import jax

    from xtagclip_tpu.ops import fused_attn_block as fab

    print("device:", jax.devices()[0], flush=True)
    print("alignment_pad(256,1280,16) =", fab.alignment_pad(256, 1280, 16),
          "(expect 1: dh=80 GAP pads L 256->257)", flush=True)
    print("alignment_pad(576,1280,16) =", fab.alignment_pad(576, 1280, 16),
          flush=True)
    towers = [
        ("ViT-H-14", dict(lbatch=64, k=6)),
        ("ViT-H-14-GAP", dict(lbatch=64, k=6, no_cls=True)),
        ("ViT-L-14", dict(lbatch=128, k=8)),
    ]
    names = sys.argv[1:]
    known = {n for n, _ in towers}
    # extra models by name; "Model@SIZE" probes at a forced image size
    # (e.g. ViT-g-14@336 — pair with XTAG_VMEM_BUDGET_MB to let the padded
    # kernel dispatch above the shipped 32 MiB supported() gate)
    for n in names:
        if n in known:
            continue
        cfg = dict(lbatch=32, k=4)
        if "@" in n:
            base, size = n.rsplit("@", 1)
            cfg.update(image_size=int(size), lbatch=16)
        towers.append((n, cfg))
    for name, cfg in towers:
        if names and name not in names:
            continue
        rates = {}
        for flag in ("0", "1"):
            os.environ["XTAG_FUSED_BLOCK"] = flag
            model = name.split("@")[0].replace("-GAP", "-CL32-GAP")
            rates[flag] = tower_rate(model, **cfg)
            print(f"  {name} fused={flag}: {rates[flag]:.1f} img/s",
                  flush=True)
        print(f"-- {name}: fused/XLA = {rates['1']/rates['0']:.3f}x",
              flush=True)


if __name__ == "__main__":
    main()
