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


def _stack_macs(n_tokens: int, width: int, layers: int) -> float:
    """Matmul MACs of a transformer stack: qkv(3) + proj(1) + mlp(8) = 12·n·d²
    per layer, attention QK^T + AV = 2·n²·d per layer. (LN/softmax excluded —
    they are bandwidth, not MXU FLOPs.)"""
    return layers * (12.0 * n_tokens * width * width
                     + 2.0 * n_tokens * n_tokens * width)


def _init_watchdog(timeout_s: float):
    """Backend init can hang indefinitely when the TPU tunnel is down (the
    device claim blocks in C, unkillable from Python). A daemon thread that
    os._exit()s after printing the contract JSON line keeps the driver's
    bench step from hanging the round."""
    import threading

    ready = threading.Event()

    def watch():
        if not ready.wait(timeout_s):
            print(json.dumps({
                "metric": "ViT-B images/sec/chip (preprocess+encode+sim)",
                "value": None, "unit": "images/sec/chip", "vs_baseline": None,
                "error": f"TPU backend did not initialize within {timeout_s:.0f}s"
                         " (tunnel down?)",
            }), flush=True)
            os._exit(2)

    threading.Thread(target=watch, daemon=True).start()
    return ready


def _run_watchdog(deadline_s: float, partial: dict):
    """Hard backstop for the whole run: the soft budget is only checked
    BETWEEN sections, so a single slow section (a cold ViT-L remote compile
    is 2-6 min) could overshoot the driver's kill window and lose the whole
    JSON. At deadline, print whatever has been measured so far (the headline
    lands in `partial` seconds after it is timed) and exit."""
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(deadline_s):
            partial.setdefault("error", "hard deadline hit; partial results")
            print(json.dumps(partial), flush=True)
            os._exit(3)

    threading.Thread(target=watch, daemon=True).start()
    return done


def main():
    backend_ready = _init_watchdog(
        float(os.environ.get("XTAG_BENCH_INIT_TIMEOUT_S", "600")))

    import jax

    # persistent compilation cache: remote-compile times vary 2-6 min run to
    # run; cached XLA binaries make repeat runs (and the driver's) fast.
    # Crash-safe writes: the driver kills over-budget benches, and a
    # truncated entry would abort every later run (utils/compile_cache.py).
    from xtagclip_tpu.utils.compile_cache import enable_persistent_cache

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    enable_persistent_cache(cache_dir, min_compile_time_secs=5.0)

    import jax.numpy as jnp

    from xtagclip_tpu.factory import create_model
    from xtagclip_tpu.ops.preprocess import normalize_images

    # never let an optional section push the whole bench past the driver's
    # budget — the headline JSON must always print. 900s default: the axon
    # tunnel's first program-load is the variable cost (measured 190-480s on
    # an identical cache-hit headline), and 420s let a slow load starve the
    # driver-tracked train/xtag/pipeline sections.
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("XTAG_BENCH_BUDGET_S", "900"))

    # headline contract fields first — the hard watchdog prints this dict
    # verbatim if the run overshoots, so it must always be a valid record
    partial = {
        "metric": "ViT-B images/sec/chip (preprocess+encode+sim)",
        "value": None, "unit": "images/sec/chip", "vs_baseline": None,
    }
    run_done = _run_watchdog(budget_s + 300.0, partial)

    def over_budget():
        return time.perf_counter() - t_start > budget_s

    def mark(section):
        # per-section elapsed to stderr: the driver only parses stdout's JSON
        import sys

        print(f"bench: +{time.perf_counter() - t_start:6.1f}s  {section}",
              file=sys.stderr, flush=True)

    dev = jax.devices()[0]
    backend_ready.set()
    mark("backend ready")

    def device_init(bundle, image_size=None):
        """Initialize a bundle's params ON the TPU. The host tunnel moves
        ~32 MB/s, so shipping CPU-initialized trees (ViT-H fp32 = 4 GB ->
        ~2 min per tower) dominated the bench; an on-device threefry init
        produces the identical tree in milliseconds once its init program
        is in the persistent cache."""
        vc = bundle.model_cfg["vision_cfg"]
        s = image_size or vc.get("image_size", 224)
        if isinstance(s, (tuple, list)):
            s = s[0]
        ctx = bundle.model_cfg["text_cfg"].get("context_length", 77)
        with jax.default_device(dev):
            variables = jax.jit(
                bundle.module.init, static_argnames=("deterministic",))(
                jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3), jnp.bfloat16),
                jnp.zeros((1, ctx), jnp.int32), deterministic=True)
        return variables["params"]

    bundle = create_model("ViT-B-32", precision="bf16", skip_init=True)
    module = bundle.module
    try:
        params = device_init(bundle)
    except Exception:  # noqa: BLE001 - fall back to host init + transfer
        bundle = create_model("ViT-B-32", precision="bf16")
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
    mark("headline: compiled inputs ready")
    np.asarray(fn(params, x_dev, class_w))  # compile + warm
    mark("headline: warm done")
    t0 = time.perf_counter()
    np.asarray(fn(params, x_dev, class_w))
    dt = time.perf_counter() - t0
    imgs_per_sec = batch * K / dt
    partial["value"] = round(imgs_per_sec, 1)
    partial["vs_baseline"] = round(imgs_per_sec / 5000.0, 3)
    mark("headline: measured")

    # model-independent device calibration: a scanned chain of bare MXU
    # matmuls. The shared chip behind the tunnel is time-sliced and its
    # effective speed swings >20x hour to hour (round-5 PERF note); this
    # pins what THIS run's slice of the chip could do, so a collapsed
    # headline is attributable to weather rather than the code. Runs right
    # AFTER the headline (the contract metric must never wait behind a
    # bad-weather program-load, which can exceed 300 s by itself).
    try:
        with jax.default_device(dev):
            # .sum() + float(): only a VALUE readback proves execution here —
            # block_until_ready returns before the device has run (measured:
            # block 0.00s, first float() 297s on a bad-weather day).
            # length=128 keeps the ~30 ms scalar-readback RTT under ~3% of
            # the timed window even at full speed (17.6 TFLOP ≈ 90 ms at peak)
            cal = jax.jit(lambda a, s: jax.lax.scan(
                lambda c, _: (jnp.tanh(c @ c), None), a + s, None,
                length=128)[0].sum())
            a0 = jax.random.normal(jax.random.PRNGKey(1), (4096, 4096),
                                   jnp.bfloat16)
            t0 = time.perf_counter()
            float(cal(a0, jnp.bfloat16(0)))  # compile + first program-load
            load_s = time.perf_counter() - t0
            best = float("inf")
            for i in range(2):
                t0 = time.perf_counter()
                float(cal(a0, jnp.bfloat16(i + 1)))
                best = min(best, time.perf_counter() - t0)
        partial["device_calibration_matmul_tflops"] = round(
            128 * 2 * 4096**3 / best / 1e12, 1)
        partial["device_calibration_first_load_s"] = round(load_s, 1)
        mark(f"device calibration: "
             f"{partial['device_calibration_matmul_tflops']} TFLOP/s steady, "
             f"first-load {load_s:.1f}s")
    except Exception as e:  # noqa: BLE001 - calibration must never kill bench
        partial["device_calibration_matmul_tflops"] = \
            f"unavailable: {type(e).__name__}"

    # p50 per-image classify latency (batch 1, full host sync per call;
    # tunnel-RTT-dominated on this box). Measured IMMEDIATELY after the
    # headline — it is a BASELINE.json north-star component and must never
    # be dropped by the time budget (round-2 VERDICT item 3); the batch-1
    # compile is cheap under the persistent cache.
    p50_ms = None
    try:
        one_fn = jax.jit(classify)
        one = jax.device_put(
            rng.integers(0, 256, size=(1, 224, 224, 3)).astype(np.uint8), dev)
        np.asarray(one_fn(params, one, class_w, jnp.bfloat16(0)))
        lat = []
        for i in range(30):
            t = time.perf_counter()
            np.asarray(one_fn(params, one, class_w, jnp.bfloat16(i * 1e-9)))
            lat.append(time.perf_counter() - t)
        p50_ms = round(float(np.median(lat) * 1e3), 3)
        mark("p50: measured")
    except Exception as e:  # noqa: BLE001
        p50_ms = f"unavailable: {type(e).__name__}"
    partial["p50_classify_latency_ms"] = p50_ms

    # device-ONLY p50: KL batch-1 classifies chained in one jit (data
    # dependency defeats elision), total device time / KL — host sync and
    # tunnel RTT excluded, so the number no longer depends on tunnel
    # weather (round-3 VERDICT item 10: wall-clock p50 drifted 27.1 ->
    # 34.6 ms across rounds from RTT alone). Reported alongside the
    # wall-clock p50, which stays as the end-to-end number.
    p50_device_ms = None
    try:
        KL = 50
        one1 = jax.device_put(
            rng.integers(0, 256, size=(1, 224, 224, 3)).astype(np.uint8),
            dev)

        def chained1(params, image_u8, class_w):
            def body(carry, _):
                out = classify(params, image_u8, class_w,
                               carry.astype(jnp.bfloat16) * 1e-9)
                return out.sum().astype(jnp.float32), out[0]
            _, outs = jax.lax.scan(body, jnp.float32(0), jnp.arange(KL))
            return outs

        one1_fn = jax.jit(chained1)
        np.asarray(one1_fn(params, one1, class_w))  # compile + warm
        best = np.inf
        for _ in range(3):
            t = time.perf_counter()
            np.asarray(one1_fn(params, one1, class_w))
            best = min(best, time.perf_counter() - t)
        p50_device_ms = round(best / KL * 1e3, 3)
        mark("p50_device: measured")
    except Exception as e:  # noqa: BLE001
        p50_device_ms = f"unavailable: {type(e).__name__}"
    partial["p50_device_only_ms"] = p50_device_ms

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
        mark("train: measured")
    except Exception as e:  # noqa: BLE001
        train_samples_per_s = f"unavailable: {type(e).__name__}"
    partial["train_samples_per_sec_chip"] = train_samples_per_s

    # analytic train-step MFU (FLOPs = 2*MACs, fwd+bwd = 3x fwd, matmuls
    # only): states what fraction of the chip the TRAIN path achieves —
    # eval-side MFU alone says nothing about the backward's efficiency
    train_tflops = None
    if isinstance(train_samples_per_s, (int, float)):
        vc, tc = bundle.model_cfg["vision_cfg"], bundle.model_cfg["text_cfg"]
        pp, dv, lv = vc["patch_size"], vc["width"], vc["layers"]
        nv = (224 // pp) ** 2 + 1
        vis_fwd = 2 * ((224 // pp) ** 2 * (pp * pp * 3) * dv
                       + _stack_macs(nv, dv, lv)
                       + dv * bundle.model_cfg["embed_dim"])
        dt_, lt, ctx = tc["width"], tc["layers"], tc["context_length"]
        txt_fwd = 2 * (_stack_macs(ctx, dt_, lt)
                       + dt_ * bundle.model_cfg["embed_dim"])
        per_sample = 3.0 * (vis_fwd + txt_fwd)
        train_tflops = round(per_sample * train_samples_per_s / 1e12, 1)

    # XTag full-model forward (the paper's actual inference path, reference
    # model.py:498-590): encode image -> tag head -> on-device pseudo-prompt
    # lookup (jnp.take over the pre-tokenized table; the reference tokenizes
    # on host inside forward) -> text tower over the 77-token prompts ->
    # TQN fusion both directions. Same chained-scan methodology. Runs BEFORE
    # the large towers: it is the flagship path and must survive the budget.
    xtag_full_imgs_per_s = None
    xtag_serve_imgs_per_s = None
    if not over_budget():
        try:
            from xtagclip_tpu.models.clip import num_combos

            xb = create_model("ViT-B-32", precision="bf16",
                              use_tagging=True, use_fusion=True,
                              skip_init=True)
            xparams = device_init(xb)
            n_cls = 3
            table = jax.device_put(jnp.asarray(rng.integers(
                1, 49407, size=(1, n_cls, num_combos(), 77)).astype(np.int32)),
                dev)
            cls_ids = jnp.asarray(
                rng.integers(0, n_cls, size=(batch,)).astype(np.int32))

            def xforward(p, images_u8, tbl, cids, salt):
                x = normalize_images(images_u8, dtype=jnp.bfloat16) + salt
                out = xb.module.apply({"params": p}, x, None, tbl, cids, 0,
                                      True)
                return (out["i2t_cls"].sum() + out["t2i_cls"].sum()
                        + out["tag_logits"].sum())

            def xchained(p, images_u8, tbl, cids):
                def body(carry, _):
                    s = xforward(p, images_u8, tbl, cids,
                                 carry.astype(jnp.bfloat16) * 1e-9)
                    return s.astype(jnp.float32), s
                _, outs = jax.lax.scan(body, jnp.float32(0), jnp.arange(8))
                return outs

            xfn = jax.jit(xchained)
            np.asarray(xfn(xparams, x_dev, table, cls_ids))  # warm
            t0 = time.perf_counter()
            np.asarray(xfn(xparams, x_dev, table, cls_ids))
            xtag_full_imgs_per_s = round(
                batch * 8 / (time.perf_counter() - t0), 1)
            mark("xtag_full: measured")
        except Exception as e:  # noqa: BLE001
            xtag_full_imgs_per_s = f"unavailable: {type(e).__name__}"

    # XTag SERVING path: same pipeline with the per-image text tower replaced
    # by the precomputed [C, K, D] prompt-feature gather (serving.py) — the
    # prompt space is finite, so a fixed checkpoint embeds it once. Fusion
    # scores all C classes per image ([B, C]). Equivalence to the full path
    # is pinned by tests/test_serving.py; this measures the speedup.
    if not over_budget() and isinstance(xtag_full_imgs_per_s, float):
        try:
            from xtagclip_tpu.models.clip import combo_index

            # random [C, K, D] prompt-feature table: gather cost is what's
            # being measured, the values don't matter for throughput
            tbl_g = jax.device_put(jnp.asarray(rng.standard_normal(
                (3, int(table.shape[2]), 512)).astype(np.float32)), dev)

            def _serve(m, imgs):
                _, tokens = m.encode_image(imgs, normalize=True,
                                           deterministic=True)
                tl = m.tag_forward(tokens, deterministic=True)
                tag_local, _ = m.prepare_tag_indices(tl)
                q = jnp.swapaxes(tbl_g[:, combo_index(tag_local)], 0, 1)
                mem = jnp.concatenate(
                    [tokens.mean(axis=1)[:, None], tokens], axis=1)
                return m.fusion_model(mem, q, deterministic=True)[..., 0]

            def schained(p, images_u8):
                def body(carry, _):
                    x = normalize_images(images_u8, dtype=jnp.bfloat16) \
                        + carry.astype(jnp.bfloat16) * 1e-9
                    i2t = xb.module.apply({"params": p}, x, method=_serve)
                    return i2t.sum().astype(jnp.float32), i2t.sum()
                _, outs = jax.lax.scan(body, jnp.float32(0), jnp.arange(8))
                return outs

            sfn = jax.jit(schained)
            np.asarray(sfn(xparams, x_dev))  # warm
            t0 = time.perf_counter()
            np.asarray(sfn(xparams, x_dev))
            xtag_serve_imgs_per_s = round(
                batch * 8 / (time.perf_counter() - t0), 1)
            mark("xtag_serve: measured")
        except Exception as e:  # noqa: BLE001
            xtag_serve_imgs_per_s = f"unavailable: {type(e).__name__}"

    # overlapped host data plane (round-2 VERDICT item 10): JPEG bytes ->
    # threaded native decode -> device_put double-buffer -> device classify,
    # sustained end-to-end samples/s through data/loader.py's machinery.
    # Host-bound on this 1-core box; reported with that caveat. Runs BEFORE
    # the optional ViT-H variants: it is a driver-tracked metric and must
    # not be the section the time budget drops (round-2 VERDICT weak #2).
    pipeline_samples_per_s = None
    if not over_budget():
        try:
            from io import BytesIO

            from PIL import Image

            from xtagclip_tpu.data.loader import DataLoader, device_prefetch
            from xtagclip_tpu.data.native import decode_batch

            pjpegs = []
            for i in range(256):
                arr = rng.integers(0, 256, size=(480, 640, 3)).astype(np.uint8)
                buf = BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG", quality=90)
                pjpegs.append(buf.getvalue())

            class JpegDataset:
                def __len__(self):
                    return len(pjpegs)

                def __getitem__(self, i):
                    return decode_batch([pjpegs[i]], 224)[0]

            pb = 64
            loader = DataLoader(JpegDataset(), batch_size=pb, shuffle=False,
                                num_workers=4, prefetch=4)
            step = jax.jit(classify)

            def run_once():
                n = 0
                last = None
                for xb in device_prefetch(iter(loader), size=2):
                    last = step(params, xb, class_w, jnp.bfloat16(0))
                    n += xb.shape[0]
                np.asarray(last)
                return n

            run_once()  # warm (compile + thread spin-up)
            t0 = time.perf_counter()
            n = run_once()
            pipeline_samples_per_s = round(n / (time.perf_counter() - t0), 1)
            mark("pipeline: measured")
        except Exception as e:  # noqa: BLE001
            pipeline_samples_per_s = f"unavailable: {type(e).__name__}"
    partial["pipeline_samples_per_sec_host"] = pipeline_samples_per_s

    # same pipeline with the host stage reduced to DECODE ONLY (SURVEY §7
    # step 3 / round-3 VERDICT item 4): M/8 DCT-scaled decode + square
    # center-crop by memcpy (round-4 VERDICT item 5 — 480x640 sources decode
    # at 4/8 and ship as 240x240 squares, 5.3x fewer h2d bytes than whole
    # sources), and the reference's whole torchvision eval chain
    # (transform.py:360-383 Resize(bicubic)+CenterCrop+Normalize) runs
    # on-device as two MXU matmuls (ops/preprocess.resize_crop_normalize).
    pipeline_device_pp_per_s = None
    if not over_budget():
        try:
            from xtagclip_tpu.data.loader import device_prefetch
            from xtagclip_tpu.data.native import decode_square_batch
            from xtagclip_tpu.ops.preprocess import resize_crop_normalize

            def classify_native(params, images_u8, sizes, class_w, salt):
                x = resize_crop_normalize(images_u8, sizes,
                                          dtype=jnp.bfloat16) + salt
                feats, _ = module.apply(
                    {"params": params}, x, True, method=module.encode_image
                )
                logits = 100.0 * jnp.matmul(
                    feats, class_w.T, preferred_element_type=jnp.float32
                )
                return jnp.argmax(logits, axis=-1)

            dstep = jax.jit(classify_native)
            pb = 64

            def square_batches():
                for i in range(0, len(pjpegs), pb):
                    imgs, sd = decode_square_batch(pjpegs[i:i + pb], 224)
                    yield imgs, np.stack([sd, sd], axis=1)

            def run_device_pp():
                n = 0
                last = None
                for imgs, sz in device_prefetch(square_batches(), size=2):
                    last = dstep(params, imgs, sz, class_w, jnp.bfloat16(0))
                    n += imgs.shape[0]
                np.asarray(last)
                return n

            run_device_pp()  # warm
            t0 = time.perf_counter()
            n = run_device_pp()
            pipeline_device_pp_per_s = round(
                n / (time.perf_counter() - t0), 1)
            mark("pipeline_device_pp: measured")
        except Exception as e:  # noqa: BLE001
            pipeline_device_pp_per_s = f"unavailable: {type(e).__name__}"
    partial["pipeline_device_preprocess_samples_per_sec"] = \
        pipeline_device_pp_per_s

    # large-tower datapoint (BASELINE config #5 path, round-2 VERDICT item 3):
    # ViT-L-14 eval pipeline img/s + achieved TFLOP/s; ViT-H-14 @224 and @336
    # budget permitting. ViT-L is itself driver-tracked (VERDICT item 3's
    # "large_tower entry") and always runs; only the H variants are gated.
    # Same chained-scan methodology as the headline.
    large_tower = {}

    def tower_rate(model_name, lbatch, k, image_size=None, no_cls=False):
        # scan-over-layers: measured +3% on ViT-L (PERF.md round 3) and far
        # cheaper to compile — right default for the deep towers.
        # no_cls: the cls-free GAP perf option (PERF.md round 3; +15% on H/14)
        lb = create_model(model_name, precision="bf16",
                          force_image_size=image_size, scan_layers=True,
                          skip_init=True,
                          **({"vision_cfg": {"no_class_token": True}}
                             if no_cls else {}))
        lparams = device_init(lb, image_size=image_size)
        size = lb.model_cfg["vision_cfg"].get("image_size", 224)
        if image_size is not None:
            size = image_size
        lcw = jnp.asarray(rng.standard_normal(
            (n_classes, lb.model_cfg["embed_dim"]), dtype=np.float32),
            jnp.bfloat16)

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
        # analytic FLOPs (2*MACs): XLA cost_analysis counts lax.scan bodies
        # once, so it under-reports scanned/chained graphs — compute from
        # the architecture instead (matmuls only; LN/softmax excluded)
        vc = lb.model_cfg["vision_cfg"]
        p, d, layers = vc["patch_size"], vc["width"], vc["layers"]
        ntok = (size // p) ** 2 + (0 if no_cls else 1)
        per_img = 2 * (
            (size // p) ** 2 * (p * p * 3) * d        # patchify
            + _stack_macs(ntok, d, layers)            # qkv/proj/attn/mlp
            + d * lb.model_cfg["embed_dim"]           # pooled projection
        )
        flops = float(per_img) * lbatch
        np.asarray(lfn(lparams, lx, lcw))  # warm
        t0 = time.perf_counter()
        np.asarray(lfn(lparams, lx, lcw))
        dt = time.perf_counter() - t0
        rate = lbatch * k / dt
        tf = flops * k / dt / 1e12  # FLOPs = 2*MACs, same convention as peak
        out = {"imgs_per_sec": round(rate, 1),
               "tflops_per_sec": round(tf, 1),
               "pct_of_bf16_peak": round(100.0 * tf / 197.0, 1)}
        return out

    for name, cfg in (
        ("ViT-L-14", dict(lbatch=128, k=8)),
        ("ViT-H-14", dict(lbatch=64, k=6)),
        ("ViT-H-14@336", dict(lbatch=32, k=4, image_size=336)),
        # cls-free GAP option (no_class_token=True): the zoo's highest-MFU
        # configuration, for from-scratch CLIPA-GAP recipes
        ("ViT-H-14-GAP-noCLS", dict(lbatch=64, k=6, no_cls=True)),
        # head-padded dh=88 giant (round-4 VERDICT item 4): the zoo's
        # ViT-g-14 — dispatches the 128-lane head-padded kernels when the
        # gate admits them (ops/fused_attn_block._HEAD_PAD)
        ("ViT-g-14", dict(lbatch=32, k=4)),
        # 44.5 MiB padded shape, admitted round 5 after the full-tower A/B
        # measured +22.7% (PERF.md round-5 head-pad table)
        ("ViT-g-14@336", dict(lbatch=16, k=4, image_size=336)),
        # dh=104 giant — +25.2% full-tower via the padded kernels (round 5)
        ("ViT-bigG-14", dict(lbatch=16, k=4)),
    ):
        # ViT-L is driver-tracked and budget-exempt; `continue` (not
        # `break`) so the exemption holds regardless of tuple order
        if over_budget() and name != "ViT-L-14":
            continue
        try:
            mark(f"large_tower: {name} start")
            large_tower[name] = tower_rate(
                name.split("@")[0].replace("-GAP-noCLS", "-CL32-GAP"), **cfg)
        except Exception as e:  # noqa: BLE001
            large_tower[name] = f"unavailable: {type(e).__name__}"
        partial["large_tower"] = dict(large_tower)

    # large-tower TRAIN datapoint (round-3 VERDICT item 5: CLIPA finetune
    # recipes like scripts/h14_224_32_finetune.sh are TRAINING configs —
    # eval-only large-tower numbers don't cover them). Full ViT-L-14
    # contrastive train step at batch 48: scan-over-layers + per-block
    # remat keep activations bounded; donate=True frees the 5.1 GB fp32
    # Adam state between steps (ViT-H train state does not fit one chip —
    # PERF.md). Same warm-twice + chained-reps methodology as the headline
    # train section.
    train_large = None
    if not over_budget():
        try:
            from xtagclip_tpu.train.loop import make_multi_step
            from xtagclip_tpu.train.scheduler import cosine_lr
            from xtagclip_tpu.train.train_state import (
                create_train_state,
                make_optimizer,
            )

            mark("train_large: start")
            # batch 64 WITH per-block remat: scan-over-layers without remat
            # saves every layer's activations and OOMs one chip at batch 48
            # (bf16[24,1024,4096] temps); remat is the production config for
            # large towers (--grad-checkpointing) and the analytic MFU below
            # accounts for the recompute (4x fwd)
            ltb, lKT = 64, 2
            lb = create_model("ViT-L-14", precision="bf16",
                              scan_layers=True, skip_init=True,
                              grad_checkpointing=True)
            lparams = device_init(lb)
            ltx = make_optimizer(cosine_lr(1e-4, 10, 1000), params=lparams,
                                 weight_decay=0.1)
            lstate = create_train_state(lparams, ltx)
            ltexts = jnp.asarray(
                rng.integers(1, 49407, size=(lKT, ltb, 77)), jnp.int32)
            limgs = normalize_images(
                jax.device_put(rng.integers(
                    0, 256, size=(lKT, ltb, 224, 224, 3)).astype(np.uint8),
                    dev),
                dtype=jnp.bfloat16)
            lbatches = {"images": limgs, "texts": ltexts}
            lstep = make_multi_step(lb.module, ltx,
                                    {"use_tagging_loss": False},
                                    num_steps=lKT, donate=True)
            for i in range(2):
                lstate, lm = lstep(lstate, lbatches, jax.random.PRNGKey(i))
                np.asarray(lm["loss"])
            lreps = 3
            t0 = time.perf_counter()
            for i in range(lreps):
                lstate, lm = lstep(lstate, lbatches,
                                   jax.random.PRNGKey(1 + i))
            np.asarray(lm["loss"])
            lrate = ltb * lKT * lreps / (time.perf_counter() - t0)
            vc, tc = lb.model_cfg["vision_cfg"], lb.model_cfg["text_cfg"]
            pp, dv, lv = vc["patch_size"], vc["width"], vc["layers"]
            nv = (224 // pp) ** 2 + 1
            vis_fwd = 2 * ((224 // pp) ** 2 * (pp * pp * 3) * dv
                           + _stack_macs(nv, dv, lv)
                           + dv * lb.model_cfg["embed_dim"])
            dt_, lt, ctx = tc["width"], tc["layers"], tc["context_length"]
            txt_fwd = 2 * (_stack_macs(ctx, dt_, lt)
                           + dt_ * lb.model_cfg["embed_dim"])
            # remat recomputes the block forwards inside the backward:
            # fwd + (recompute-fwd + bwd) = 4x fwd matmul FLOPs
            ltf = 4.0 * (vis_fwd + txt_fwd) * lrate / 1e12
            train_large = {
                "model": "ViT-L-14", "batch": ltb,
                "samples_per_sec_chip": round(lrate, 1),
                "tflops_per_sec": round(ltf, 1),
                "pct_of_bf16_peak": round(100.0 * ltf / 197.0, 1),
            }
            del lstate, lparams, lstep, limgs, lbatches
            mark("train_large: measured")
        except Exception as e:  # noqa: BLE001
            train_large = f"unavailable: {type(e).__name__}"
    partial["train_large_tower"] = train_large

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
        mark("decode: measured")
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

    result = {
        "metric": "ViT-B images/sec/chip (preprocess+encode+sim)",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / 5000.0, 3),
        "train_samples_per_sec_chip": train_samples_per_s,
        "train_tflops_per_sec": train_tflops,
        "decode_imgs_per_sec_host": decode_imgs_per_s,
        "p50_classify_latency_ms": p50_ms,
        "p50_device_only_ms": p50_device_ms,
        "large_tower": large_tower or None,
        "train_large_tower": train_large,
        "xtag_full_forward_imgs_per_sec": xtag_full_imgs_per_s,
        "xtag_serve_imgs_per_sec": xtag_serve_imgs_per_s,
        "pipeline_samples_per_sec_host": pipeline_samples_per_s,
        "pipeline_device_preprocess_samples_per_sec": pipeline_device_pp_per_s,
        "h2d_bandwidth_MBps": round(h2d_mbps, 0),
        "device_calibration_matmul_tflops": partial.get(
            "device_calibration_matmul_tflops"),
        "device_calibration_first_load_s": partial.get(
            "device_calibration_first_load_s"),
        "device": str(dev),
        "batch": batch,
        "note": ("device pipeline rate from device-resident uint8; JPEG "
                 "decode (host-bound, 1-core box) and h2d (tunnel-limited) "
                 "reported separately. pipeline_device_preprocess ships "
                 "M/8 DCT-scaled square center-crops (240x240 = 173 KB/img "
                 "for these 480x640 sources, vs 150 KB host-cropped and "
                 "~1 MB whole) — the host stage is decode+memcpy only; "
                 "resample/crop/normalize ride the MXU"),
    }
    mark("h2d: measured")
    run_done.set()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
