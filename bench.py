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
import os
import time

import numpy as np


def main():
    import jax

    # persistent compilation cache: remote-compile times vary 2-6 min run to
    # run; cached XLA binaries make repeat runs (and the driver's) fast
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001 — older jax without the knobs
        pass

    import jax.numpy as jnp

    from xtagclip_tpu.factory import create_model
    from xtagclip_tpu.ops.preprocess import normalize_images

    # never let an optional section push the whole bench past the driver's
    # budget — the headline JSON must always print
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("XTAG_BENCH_BUDGET_S", "420"))

    def over_budget():
        return time.perf_counter() - t_start > budget_s

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

    # train-step throughput (reference headline telemetry: samples/s,
    # train_other.py:251-259): full contrastive train step — forward both
    # towers, backward, AdamW — KT steps chained in one jit via
    # make_multi_step. Guarded: the headline JSON must print even if an
    # optional section fails or the compile budget runs out.
    train_samples_per_s = None
    try:
        import sys

        if over_budget():
            raise TimeoutError("bench time budget consumed by eval section")

        from xtagclip_tpu.train.loop import make_multi_step
        from xtagclip_tpu.train.scheduler import cosine_lr
        from xtagclip_tpu.train.train_state import (
            create_train_state,
            make_optimizer,
        )

        tb = 128  # per-chip train batch
        KT = 4
        tx = make_optimizer(cosine_lr(1e-4, 10, 1000), params=params,
                            weight_decay=0.1)
        state = create_train_state(params, tx)
        texts = jnp.asarray(rng.integers(1, 49407, size=(KT, tb, 77)),
                            jnp.int32)
        imgs_f = normalize_images(
            jax.device_put(
                rng.integers(0, 256,
                             size=(KT, tb, 224, 224, 3)).astype(np.uint8),
                dev),
            dtype=jnp.bfloat16)
        batches = {"images": imgs_f, "texts": texts}
        # donate=False: one compile (donation changes the output layout and
        # forces a second compile), and `params` stays alive for the latency
        # section below.
        step_fn = make_multi_step(bundle.module, tx,
                                  {"use_tagging_loss": False}, num_steps=KT,
                                  donate=False)
        print("bench: compiling train step...", file=sys.stderr, flush=True)
        # two warm calls: the fresh state's layout differs from the jitted
        # output's, so feeding the output back recompiles exactly once; a
        # host readback of the loss is the only true sync on this async
        # tunnel runtime (block_until_ready returns early here)
        for i in range(2):
            state, m = step_fn(state, batches, jax.random.PRNGKey(i))
            np.asarray(m["loss"])
        reps = 4  # chained through state: one readback times all reps
        t0 = time.perf_counter()
        for i in range(reps):
            state, m = step_fn(state, batches, jax.random.PRNGKey(1 + i))
        np.asarray(m["loss"])
        train_samples_per_s = round(
            tb * KT * reps / (time.perf_counter() - t0), 1)
    except Exception as e:  # noqa: BLE001
        train_samples_per_s = f"unavailable: {type(e).__name__}"

    # host JPEG-decode rate (the data plane the device pipeline number
    # excludes): native threaded libjpeg decode+resize+crop to 224.
    # JPEG decode is host-bound on this 1-core box — reported separately so
    # the "JPEG->embedding" north star is stated honestly.
    decode_imgs_per_s = None
    try:
        from io import BytesIO

        from PIL import Image

        from xtagclip_tpu.data.native import decode_batch

        jpegs = []
        for i in range(64):
            arr = rng.integers(0, 256, size=(480, 640, 3)).astype(np.uint8)
            buf = BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=90)
            jpegs.append(buf.getvalue())
        decode_batch(jpegs[:8], 224)  # warm the lib
        t0 = time.perf_counter()
        decode_batch(jpegs, 224)
        decode_imgs_per_s = round(len(jpegs) / (time.perf_counter() - t0), 1)
    except Exception as e:  # noqa: BLE001
        decode_imgs_per_s = f"unavailable: {type(e).__name__}"

    # host->device transfer bandwidth (distinct buffers, full sync)
    bufs = [rng.integers(0, 256, size=(batch, 224, 224, 3)).astype(np.uint8)
            for _ in range(6)]
    jax.device_put(bufs[0], dev).block_until_ready()
    t0 = time.perf_counter()
    for b in bufs:
        jax.device_put(b, dev).block_until_ready()
    h2d_mbps = len(bufs) * bufs[0].nbytes / (time.perf_counter() - t0) / 1e6

    # p50 per-image classify latency (batch 1, full host sync per call;
    # tunnel-RTT-dominated on this box)
    p50_ms = None
    if not over_budget():
        one_fn = jax.jit(classify)
        one = jax.device_put(bufs[0][:1], dev)
        np.asarray(one_fn(params, one, class_w, jnp.bfloat16(0)))
        lat = []
        for i in range(30):
            t = time.perf_counter()
            np.asarray(one_fn(params, one, class_w, jnp.bfloat16(i * 1e-9)))
            lat.append(time.perf_counter() - t)
        p50_ms = round(float(np.median(lat) * 1e3), 3)

    result = {
        "metric": "ViT-B images/sec/chip (preprocess+encode+sim)",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / 5000.0, 3),
        "train_samples_per_sec_chip": train_samples_per_s,
        "decode_imgs_per_sec_host": decode_imgs_per_s,
        "p50_classify_latency_ms": p50_ms,
        "h2d_bandwidth_MBps": round(h2d_mbps, 0),
        "device": str(dev),
        "batch": batch,
        "note": ("device pipeline rate from device-resident uint8; JPEG "
                 "decode (host-bound, 1-core box) and h2d (tunnel-limited) "
                 "reported separately"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
