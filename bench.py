"""Benchmark: ViT-B images/sec/chip (preprocess+encode+sim) + p50 classify latency.

Runs on jax.devices()[0] (the real TPU chip under the driver). Measured
pipeline: uint8 HWC batch (device-resident) -> fused normalize -> ViT-B-32
encode (bf16, fused attention) -> logit_scale * feat @ class_embeddings.T ->
top-1.

Methodology note: this host reaches the chip through a network tunnel whose
dispatch is asynchronous, so per-step host timing over-/under-counts wildly.
The steady-state number therefore chains K forwards inside ONE jit
(lax.scan with a data dependency between iterations) and forces a host
readback — pure device pipeline rate, no tunnel artifacts. Host->device
bandwidth is reported separately.

Prints ONE JSON line with vs_baseline relative to the 5,000 img/s/chip
north star (BASELINE.json).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from xtagclip_tpu.factory import create_model
    from xtagclip_tpu.ops.preprocess import normalize_images

    dev = jax.devices()[0]
    bundle = create_model("ViT-B-32", precision="bf16")
    module = bundle.module
    params = jax.device_put(bundle.params, dev)

    n_classes = 64
    rng = np.random.default_rng(0)
    class_w = jnp.asarray(
        rng.standard_normal((n_classes, 512), dtype=np.float32), jnp.bfloat16
    )

    def classify(params, images_u8, class_w, salt):
        x = normalize_images(images_u8, dtype=jnp.bfloat16) + salt
        feats, _ = module.apply(
            {"params": params}, x, True, method=module.encode_image
        )
        logits = 100.0 * jnp.matmul(
            feats, class_w.T, preferred_element_type=jnp.float32
        )
        return jnp.argmax(logits, axis=-1)

    K = 20
    batch = 256

    def chained(params, images_u8, class_w):
        # data dependency between iterations defeats any caching/elision
        def body(carry, _):
            out = classify(params, images_u8, class_w,
                           carry.astype(jnp.bfloat16) * 1e-9)
            return out.sum().astype(jnp.float32), out[0]
        carry, outs = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return outs

    fn = jax.jit(chained)
    x_dev = jax.device_put(
        rng.integers(0, 256, size=(batch, 224, 224, 3)).astype(np.uint8), dev
    )
    np.asarray(fn(params, x_dev, class_w))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(fn(params, x_dev, class_w))
    dt = time.perf_counter() - t0
    imgs_per_sec = batch * K / dt

    # host->device transfer bandwidth (distinct buffers, full sync)
    bufs = [rng.integers(0, 256, size=(batch, 224, 224, 3)).astype(np.uint8)
            for _ in range(6)]
    jax.device_put(bufs[0], dev).block_until_ready()
    t0 = time.perf_counter()
    for b in bufs:
        jax.device_put(b, dev).block_until_ready()
    h2d_mbps = len(bufs) * bufs[0].nbytes / (time.perf_counter() - t0) / 1e6

    # p50 per-image classify latency (batch 1, full host sync per call)
    one_fn = jax.jit(classify)
    one = jax.device_put(bufs[0][:1], dev)
    np.asarray(one_fn(params, one, class_w, jnp.bfloat16(0)))
    lat = []
    for i in range(50):
        t = time.perf_counter()
        np.asarray(one_fn(params, one, class_w, jnp.bfloat16(i * 1e-9)))
        lat.append(time.perf_counter() - t)
    p50_ms = float(np.median(lat) * 1e3)

    result = {
        "metric": "ViT-B images/sec/chip (preprocess+encode+sim)",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / 5000.0, 3),
        "p50_classify_latency_ms": round(p50_ms, 3),
        "h2d_bandwidth_MBps": round(h2d_mbps, 0),
        "device": str(dev),
        "batch": batch,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
