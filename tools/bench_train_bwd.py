"""On-chip A/B of the train path: XLA autodiff vs the Pallas backward pair.

Measures the full contrastive ViT-B-32 train step (both towers, backward,
AdamW) with the Pallas attention-half backward off/on, plus per-tower
variants that isolate which tower gains/loses (the text tower's causal
l=77 geometry was the initial regression suspect — it wasn't: EVERY
variant loses, see ops/fused_attn_block.py module doc).

Methodology mirrors bench.py's train section: two warm calls (the fresh
state's layout differs from the jitted output's — feeding the output back
recompiles exactly once), reps chained through the state, ONE loss
readback as the sync (per-call block_until_ready returns early on the
tunneled runtime). A per-rep readback variant of this script once
reported 75k samples/s for the baseline — always chain + single-sync.

Round-4 result (v5e-1):
    xla               1610.1 samples/s   1.000x
    fused_all         1388.4 samples/s   0.862x
    fused_vision_only 1560.4 samples/s   0.969x
    fused_text_only   1576.4 samples/s   0.979x

Usage: python tools/bench_train_bwd.py [batch]
"""

import os
import sys
import time

import numpy as np

VARIANTS = [
    ("xla", "0", None),
    ("fused_all", "1", None),
    ("fused_vision_only", "1", "no_mask"),
    ("fused_text_only", "1", "mask_only"),
]


def main():
    import jax
    import jax.numpy as jnp

    from xtagclip_tpu.factory import create_model
    from xtagclip_tpu.ops import fused_attn_block as fab
    from xtagclip_tpu.ops.preprocess import normalize_images
    from xtagclip_tpu.train.loop import make_multi_step
    from xtagclip_tpu.train.scheduler import cosine_lr
    from xtagclip_tpu.train.train_state import (
        create_train_state,
        make_optimizer,
    )
    from xtagclip_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
        min_compile_time_secs=5.0,
    )

    os.environ["XTAG_FUSED_TRAIN"] = "0"
    tb = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    KT = 4
    dev = jax.devices()[0]
    print("backend:", jax.default_backend(), dev, flush=True)
    rng = np.random.default_rng(0)

    bundle = create_model("ViT-B-32", precision="bf16")
    params = jax.device_put(bundle.params, dev)
    tx = make_optimizer(cosine_lr(1e-4, 10, 1000), params=params,
                        weight_decay=0.1)
    texts = jnp.asarray(rng.integers(1, 49407, size=(KT, tb, 77)), jnp.int32)
    imgs = normalize_images(
        jax.device_put(
            rng.integers(0, 256, size=(KT, tb, 224, 224, 3)).astype(np.uint8),
            dev),
        dtype=jnp.bfloat16)
    batches = {"images": imgs, "texts": texts}

    orig = fab.supported_bwd
    results = {}
    for name, gate, patch in VARIANTS:
        os.environ["XTAG_FUSED_TRAIN_BWD"] = gate
        if patch == "no_mask":
            fab.supported_bwd = (
                lambda shape, h, dtype=jnp.bfloat16, mask_shape=None:
                mask_shape is None and orig(shape, h, dtype, mask_shape))
        elif patch == "mask_only":
            fab.supported_bwd = (
                lambda shape, h, dtype=jnp.bfloat16, mask_shape=None:
                mask_shape is not None and orig(shape, h, dtype, mask_shape))
        else:
            fab.supported_bwd = orig
        state = create_train_state(params, tx)
        step_fn = make_multi_step(bundle.module, tx,
                                  {"use_tagging_loss": False}, num_steps=KT,
                                  donate=False)
        t0 = time.perf_counter()
        for i in range(2):
            state, m = step_fn(state, batches, jax.random.PRNGKey(i))
            np.asarray(m["loss"])
        compile_s = time.perf_counter() - t0
        reps = 4
        t0 = time.perf_counter()
        for i in range(reps):
            state, m = step_fn(state, batches, jax.random.PRNGKey(1 + i))
        loss = float(np.asarray(m["loss"]).ravel()[-1])
        dt = time.perf_counter() - t0
        results[name] = tb * KT * reps / dt
        print(f"{name}: {results[name]:.1f} samples/s (loss {loss:.4f}, "
              f"warm+compile {compile_s:.1f}s)", flush=True)
    fab.supported_bwd = orig
    base = results.get("xla")
    for name, sps in results.items():
        if base:
            print(f"{name}: {sps / base:.3f}x vs xla", flush=True)


if __name__ == "__main__":
    main()
