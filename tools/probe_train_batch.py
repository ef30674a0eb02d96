"""On-chip probe: contrastive train-step throughput vs per-chip batch.

bench.py measures the ViT-B-32 train step at tb=128 (43% MFU). This probe
answers: is the per-step constant overhead (AdamW elementwise traffic,
loss, scheduler) amortized enough at 128, or does a larger per-chip batch
buy real MFU? Also isolates the optimizer by timing an update-only step
(zero grads) — pure HBM-traffic floor of AdamW over the 151M-param tree —
and decomposes one batch size into fwd-only / fwd+bwd / full-step times
so the MFU ceiling attributes to a stage, not a guess (round-4 VERDICT
item 2).

Run: python tools/probe_train_batch.py [--gap] [--decompose TB] [tb ...]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from xtagclip_tpu.factory import create_model
    from xtagclip_tpu.ops.preprocess import normalize_images
    from xtagclip_tpu.train.loop import make_multi_step
    from xtagclip_tpu.train.scheduler import cosine_lr
    from xtagclip_tpu.train.train_state import (
        apply_gradients,
        create_train_state,
        make_optimizer,
    )

    argv = sys.argv[1:]
    gap = "--gap" in argv
    remat = "--remat" in argv
    scan = "--scan" in argv
    decompose_tb = None
    if "--decompose" in argv:
        i = argv.index("--decompose")
        decompose_tb = int(argv[i + 1])
        del argv[i:i + 2]
    argv = [a for a in argv if a not in ("--gap", "--remat", "--scan")]

    dev = jax.devices()[0]
    print("device:", dev)
    kw = ({"vision_cfg": {"no_class_token": True, "pool_type": "avg"}}
          if gap else {})
    bundle = create_model("ViT-B-32", precision="bf16", skip_init=True,
                          grad_checkpointing=remat, scan_layers=scan, **kw)
    variant = [n for n, on in (("GAP", gap), ("remat", remat),
                               ("scan", scan)) if on]
    if variant:
        print("variant:", "+".join(variant))
    module = bundle.module
    vc = bundle.model_cfg["vision_cfg"]
    ctx = bundle.model_cfg["text_cfg"].get("context_length", 77)
    with jax.default_device(dev):
        variables = jax.jit(
            module.init, static_argnames=("deterministic",))(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
            jnp.zeros((1, ctx), jnp.int32), deterministic=True)
    params = variables["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.1f}M")
    rng = np.random.default_rng(0)

    tx = make_optimizer(cosine_lr(1e-4, 10, 1000), params=params,
                        weight_decay=0.1)

    # --- optimizer-only floor: apply zero grads KT times in one jit ---
    state = create_train_state(params, tx)
    KT = 8

    def opt_only(state):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def body(s, _):
            return apply_gradients(s, zeros, tx), ()
        s, _ = jax.lax.scan(body, state, jnp.arange(KT))
        return s

    f = jax.jit(opt_only)
    s = f(state)
    s = f(s)
    np.asarray(s.step)
    t0 = time.perf_counter()
    s = f(s)
    np.asarray(s.step)
    dt = (time.perf_counter() - t0) / KT
    print(f"optimizer-only: {dt*1e3:.2f} ms/step "
          f"(AdamW traffic floor over {n_params/1e6:.0f}M fp32 params)")

    # --- stage decomposition at one batch size: fwd-only loss eval,
    # fwd+bwd (value_and_grad, update discarded), full step (grads +
    # AdamW). Each is KT scanned iterations in one jit so the deltas are
    # dispatch-free; full - fwdbwd ~= optimizer+state plumbing, fwdbwd /
    # fwd ~= autodiff multiplier XLA actually achieves (analytic = 3x).
    if decompose_tb is not None:
        from xtagclip_tpu.train.loop import _model_losses

        tb = decompose_tb
        KT = 4
        state = create_train_state(params, tx)
        texts = jnp.asarray(rng.integers(1, 49407, size=(tb, ctx)), jnp.int32)
        imgs_f = normalize_images(
            jax.device_put(rng.integers(0, 256, size=(tb, 224, 224, 3))
                           .astype(np.uint8), dev), dtype=jnp.bfloat16)
        batch = {"images": imgs_f, "texts": texts}
        cfg = {"use_tagging_loss": False}

        def loss_of(p, rng_):
            loss, _ = _model_losses(module, p, batch, {"dropout": rng_},
                                    cfg, None)
            return loss

        def fwd_only(p, rng_):
            def body(acc, i):
                return acc + loss_of(p, jax.random.fold_in(rng_, i)), ()
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(KT))
            return acc

        def fwd_bwd(p, rng_):
            def body(acc, i):
                l, g = jax.value_and_grad(loss_of)(
                    p, jax.random.fold_in(rng_, i))
                gn = sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                         for x in jax.tree_util.tree_leaves(g))
                # 1e-18 (not 0.0): a literal zero coefficient lets XLA
                # fold the term away and DCE the whole backward pass
                return acc + l + 1e-18 * gn, ()
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(KT))
            return acc

        def full_step(s, rng_):
            def body(st, i):
                _, g = jax.value_and_grad(loss_of)(
                    st.params, jax.random.fold_in(rng_, i))
                return apply_gradients(st, g, tx), ()
            s2, _ = jax.lax.scan(body, s, jnp.arange(KT))
            return s2

        print(f"decomposition at tb={tb} (KT={KT} scanned, ms/step):")
        for name, fn, arg in (("fwd-only ", jax.jit(fwd_only), params),
                              ("fwd+bwd  ", jax.jit(fwd_bwd), params)):
            r = fn(arg, jax.random.PRNGKey(0))
            np.asarray(r)
            t0 = time.perf_counter()
            r = fn(arg, jax.random.PRNGKey(1))
            np.asarray(r)
            print(f"  {name}: {(time.perf_counter()-t0)/KT*1e3:8.2f}")
        # donate the state like the production multi-step: without it the
        # non-donated fp32 state forces a full copy per call (measured
        # 181 ms vs 66.9 ms production at tb=128)
        fs = jax.jit(full_step, donate_argnums=0)
        s = fs(state, jax.random.PRNGKey(0))
        s = fs(s, jax.random.PRNGKey(1))
        np.asarray(s.step)
        t0 = time.perf_counter()
        s = fs(s, jax.random.PRNGKey(2))
        np.asarray(s.step)
        print(f"  full-step: {(time.perf_counter()-t0)/KT*1e3:8.2f}")

    tbs = [int(a) for a in argv] or [128, 256]
    for tb in tbs:
        KT = 4
        state = create_train_state(params, tx)
        texts = jnp.asarray(rng.integers(1, 49407, size=(KT, tb, ctx)),
                            jnp.int32)
        imgs_f = normalize_images(
            jax.device_put(
                rng.integers(0, 256, size=(KT, tb, 224, 224, 3))
                .astype(np.uint8), dev),
            dtype=jnp.bfloat16)
        batches = {"images": imgs_f, "texts": texts}
        # donate=True matches the production trainer and is required at
        # tb>=256: without donation the duplicated fp32 train state plus
        # un-rematted bwd activations exhaust HBM (tb=256 OOMed, round 5)
        step_fn = make_multi_step(module, tx, {"use_tagging_loss": False},
                                  num_steps=KT, donate=True)
        for i in range(2):
            state, m = step_fn(state, batches, jax.random.PRNGKey(i))
            np.asarray(m["loss"])
        reps = 4
        t0 = time.perf_counter()
        for i in range(reps):
            state, m = step_fn(state, batches, jax.random.PRNGKey(1 + i))
        np.asarray(m["loss"])
        dt = time.perf_counter() - t0
        sps = tb * KT * reps / dt
        ms = dt / (KT * reps) * 1e3
        print(f"tb={tb}: {sps:.1f} samples/s  {ms:.2f} ms/step")


if __name__ == "__main__":
    main()
