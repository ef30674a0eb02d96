"""On-chip probe: the head-padded fused attention half at ViT-g geometry.

dh 88/104 (ViT-g / ViT-bigG) cannot hit the Mosaic compiler at their real
head width (unaligned per-head lane slices crash it); round 4 pads every
head to a 128-lane block in the weights (ops/fused_attn_block._HEAD_PAD).
The interpret-mode tests pin exactness; THIS script answers the on-chip
questions: does the padded kernel compile+run on real TPU, is it correct
there, and is it faster than the composed XLA chain?

Run: python tools/probe_head_pad.py
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from xtagclip_tpu.ops import fused_attn_block as fab  # noqa: E402


def chain(x, ls, lb, wqkv, bqkv, wout, bout, h, eps=1e-5):
    # the SAME oracle the tests pin against (advisor round 4: don't keep a
    # third copy of the math that can silently drift from the pinned one)
    return fab._reference_chain(x, ls, lb, wqkv, bqkv, wout, bout,
                                num_heads=h, eps=eps)


def probe(name, b, l, d, h, reps=30):
    print(f"-- {name}: B={b} L={l} D={d} h={h} dh={d//h} "
          f"head_pad={fab.head_pad(d, h)} "
          f"supported={fab.supported((b, l, d), h)}")
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.02, jnp.bfloat16)
    x = f(b, l, d)
    ls, lb = jnp.ones((d,), jnp.bfloat16), jnp.zeros((d,), jnp.bfloat16)
    wqkv, bqkv = f(d, 3 * d), f(3 * d)
    wout, bout = f(d, d), f(d)
    args = (x, ls, lb, wqkv, bqkv, wout, bout)

    fused = jax.jit(lambda *a: fab.fused_attn_half(*a, num_heads=h))
    ref = jax.jit(lambda *a: chain(*a, h=h))
    try:
        y = np.asarray(fused(*args))
    except Exception as e:  # noqa: BLE001
        print(f"   fused: CRASH {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return
    yr = np.asarray(ref(*args))
    err = np.abs(y.astype(np.float32) - yr.astype(np.float32)).max()
    bit = bool((y == yr).all())
    print(f"   max|err| vs chain = {err:.3e}  bit_identical={bit}",
          flush=True)

    def bench(fn):
        def chained(x0):
            def body(c, _):
                o = fn(c, ls, lb, wqkv, bqkv, wout, bout)
                return o, ()
            out, _ = jax.lax.scan(body, x0, jnp.arange(reps))
            return out
        g = jax.jit(chained)
        np.asarray(g(x))  # warm
        t0 = time.perf_counter()
        np.asarray(g(x))
        return (time.perf_counter() - t0) / reps * 1e3

    try:
        tf = bench(lambda *a: fab.fused_attn_half(*a, num_heads=h))
    except Exception as e:  # noqa: BLE001
        print(f"   fused-in-scan: CRASH {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return
    tc = bench(lambda *a: chain(*a, h=h))
    print(f"   fused {tf:.3f} ms  chain {tc:.3f} ms  speedup {tc/tf:.3f}x",
          flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    # ViT-g-14 @224: head-padded dh=88 (crashed IN-SCAN at the default
    # 16 MiB scoped-vmem limit before compiler_params raised it)
    probe("ViT-g-14 @224 (dh=88, padded)", 8, 257, 1408, 16)
    # bigG @224: head-padded dh=104, estimate 36.4 MiB
    probe("ViT-bigG-14 @224 (dh=104, padded)", 4, 257, 1664, 16)
    # ViT-g @336: estimate 44.5 MiB
    probe("ViT-g-14 @336 (dh=88, padded)", 4, 577, 1408, 16)
    # dh=80 at lane-aligned L: the round-3 deterministic Mosaic crash —
    # does the raised limit clear it?
    probe("ViT-H GAP raw (dh=80, L=256)", 8, 256, 1280, 16)
    # control: unpadded dh=64 path still healthy
    probe("ViT-B-32 control (dh=64)", 8, 50, 768, 12)
