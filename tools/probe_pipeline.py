"""A/B the two end-to-end data-plane pipelines from bench.py in isolation:

  host-crop : native decode+resize to 224 on host -> ship uint8 -> device
              normalize+encode+classify (bench.py "pipeline" section)
  device-pp : DCT-scaled decode + square memcpy crop on host (240x240 for
              480x640 sources) -> ship uint8 squares -> device
              resize_crop_normalize (two MXU matmuls) + encode + classify
              (bench.py "pipeline_device_pp" section)

Round-4 VERDICT item 5's done-criterion is device-pp >= host-crop ON THIS
BOX (r04: 31.6 vs 127.7 when the device path still shipped whole padded
sources at ~1 MB/img). Run on the real chip, fresh process:

    python tools/probe_pipeline.py [--n 256] [--batch 64] [--rounds 2]

Ref eval chain being replaced: /root/reference/src/open_clip/transform.py
:360-383 (Resize(bicubic)+CenterCrop+ToTensor+Normalize on host).
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from io import BytesIO

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from xtagclip_tpu.data.loader import DataLoader, device_prefetch
    from xtagclip_tpu.data.native import decode_batch, decode_square_batch
    from xtagclip_tpu.factory import create_model
    from xtagclip_tpu.ops.preprocess import (normalize_images,
                                             resize_crop_normalize)

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    jpegs = []
    for _ in range(args.n):
        arr = rng.integers(0, 256, size=(480, 640, 3)).astype(np.uint8)
        buf = BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        jpegs.append(buf.getvalue())

    bundle = create_model("ViT-B-32", precision="bf16")
    module = bundle.module
    params = jax.device_put(bundle.params)
    class_w = jnp.asarray(
        rng.standard_normal((64, 512), dtype=np.float32), jnp.bfloat16)

    def classify(params, images_u8, class_w, salt):
        x = normalize_images(images_u8, dtype=jnp.bfloat16) + salt
        feats, _ = module.apply({"params": params}, x, True,
                                method=module.encode_image)
        logits = 100.0 * jnp.matmul(feats, class_w.T,
                                    preferred_element_type=jnp.float32)
        return jnp.argmax(logits, axis=-1)

    def classify_native(params, images_u8, sizes, class_w, salt):
        x = resize_crop_normalize(images_u8, sizes, dtype=jnp.bfloat16) + salt
        feats, _ = module.apply({"params": params}, x, True,
                                method=module.encode_image)
        logits = 100.0 * jnp.matmul(feats, class_w.T,
                                    preferred_element_type=jnp.float32)
        return jnp.argmax(logits, axis=-1)

    pb = args.batch

    # --- host-crop path (bench.py "pipeline" section, verbatim shape) ---
    class JpegDataset:
        def __len__(self):
            return len(jpegs)

        def __getitem__(self, i):
            return decode_batch([jpegs[i]], 224)[0]

    loader = DataLoader(JpegDataset(), batch_size=pb, shuffle=False,
                        num_workers=4, prefetch=4)
    step = jax.jit(classify)

    def run_host():
        n, last = 0, None
        for xb in device_prefetch(iter(loader), size=2):
            last = step(params, xb, class_w, jnp.bfloat16(0))
            n += xb.shape[0]
        np.asarray(last)
        return n

    # --- device-pp path (bench.py "pipeline_device_pp" section) ---
    dstep = jax.jit(classify_native)

    def square_batches():
        for i in range(0, len(jpegs), pb):
            imgs, sd = decode_square_batch(jpegs[i:i + pb], 224)
            yield imgs, np.stack([sd, sd], axis=1)

    def run_device_pp():
        n, last = 0, None
        for imgs, sz in device_prefetch(square_batches(), size=2):
            last = dstep(params, imgs, sz, class_w, jnp.bfloat16(0))
            n += imgs.shape[0]
        np.asarray(last)
        return n

    imgs0, _ = decode_square_batch(jpegs[:pb], 224)
    print(f"shipped bytes/img: host={224*224*3}, device-pp="
          f"{imgs0.shape[1]*imgs0.shape[2]*3} (slab {imgs0.shape[1]})",
          flush=True)

    run_host()       # warm: compile + thread spin-up
    run_device_pp()  # warm
    for r in range(args.rounds):
        t0 = time.perf_counter()
        n = run_host()
        host_rate = n / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        n = run_device_pp()
        dev_rate = n / (time.perf_counter() - t0)
        print(f"round {r}: host-crop {host_rate:.1f}/s  "
              f"device-pp {dev_rate:.1f}/s  ratio {dev_rate/host_rate:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
