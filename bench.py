"""Benchmark: ViT-B images/sec/chip (preprocess+encode+sim) + p50 classify latency.

Runs on whatever jax.devices()[0] is (the real TPU chip under the driver).
Pipeline measured: uint8 HWC batch -> device -> fused normalize -> ViT-B-32
encode (bf16) -> logit_scale * feat @ class_embeddings.T -> top-1. Host->device
transfer is inside the timed loop (double-buffered), so the number is the
end-to-end device pipeline rate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the 5,000 img/s/chip north star (BASELINE.json).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from xtagclip_tpu.factory import create_model
    from xtagclip_tpu.ops.preprocess import normalize_images

    dev = jax.devices()[0]
    bundle = create_model("ViT-B-32", precision="bf16")
    module, params = bundle.module, bundle.params
    params = jax.device_put(params, dev)

    n_classes = 64
    rng = np.random.default_rng(0)
    class_w = jnp.asarray(
        rng.standard_normal((n_classes, 512), dtype=np.float32), jnp.bfloat16
    )

    def classify(params, images_u8, class_w):
        x = normalize_images(images_u8, dtype=jnp.bfloat16)
        feats, _ = module.apply(
            {"params": params}, x, True, method=module.encode_image
        )
        logits = 100.0 * jnp.matmul(
            feats, class_w.T, preferred_element_type=jnp.float32
        )
        return jnp.argmax(logits, axis=-1)

    fn = jax.jit(classify)

    batch = 256
    n_batches = 24
    host_batches = [
        rng.integers(0, 256, size=(batch, 224, 224, 3)).astype(np.uint8)
        for _ in range(4)
    ]

    # warmup/compile
    out = fn(params, jax.device_put(host_batches[0], dev), class_w)
    out.block_until_ready()

    # throughput: keep 2 transfers in flight, time steady state
    t0 = time.perf_counter()
    futures = []
    for i in range(n_batches):
        x = jax.device_put(host_batches[i % len(host_batches)], dev)
        futures.append(fn(params, x, class_w))
        if len(futures) > 2:
            futures.pop(0).block_until_ready()
    for f in futures:
        f.block_until_ready()
    dt = time.perf_counter() - t0
    imgs_per_sec = batch * n_batches / dt

    # p50 per-image classify latency (batch 1)
    one = jax.device_put(host_batches[0][:1], dev)
    fn(params, one, class_w).block_until_ready()
    lat = []
    for _ in range(50):
        t = time.perf_counter()
        fn(params, one, class_w).block_until_ready()
        lat.append(time.perf_counter() - t)
    p50_ms = float(np.median(lat) * 1e3)

    result = {
        "metric": "ViT-B images/sec/chip (preprocess+encode+sim)",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / 5000.0, 3),
        "p50_classify_latency_ms": round(p50_ms, 3),
        "device": str(dev),
        "batch": batch,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
