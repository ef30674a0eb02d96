"""On-chip matrix probe: fused attention-half time vs scoped-VMEM limit.

Round-4 raised every pallas_call's vmem_limit_bytes to a blanket 100 MiB
to admit the head-padded giants — and the whole ViT-H family regressed
~7% (BENCH_r04 vs r03; tools/probe_vith_ab.py attributed it to the raise:
dh=80 full-tower 345.9 img/s at 100 MiB vs 373 at 32 MiB/default).  The
scoped limit is a scheduler knob, not just a ceiling: raising it changes
Mosaic's pipelining decisions per shape.  This probe measures each
shipped tower geometry at each candidate limit so the per-shape policy
(_vmem_limit_for) is set from data, not a blanket.

Run: python tools/probe_vmem_matrix.py            # all shapes x limits
     python tools/probe_vmem_matrix.py 32 100     # restrict limits
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [
    # name, B, L, D, heads  — the bench-critical + head-padded geometries
    ("ViT-B-32   dh=64 L=50", 8, 50, 768, 12),
    ("ViT-L-14   dh=64 L=257", 8, 257, 1024, 16),
    ("ViT-H-14   dh=80 L=257", 8, 257, 1280, 16),
    ("ViT-H@336  dh=80 L=577", 4, 577, 1280, 16),
    ("ViT-g-14   dh=88 L=257", 8, 257, 1408, 16),
    ("ViT-bigG   dh=104 L=257", 4, 257, 1664, 16),
    ("ViT-g@336  dh=88 L=577", 4, 577, 1408, 16),
]


def main():
    import jax
    import jax.numpy as jnp

    from xtagclip_tpu.ops import fused_attn_block as fab

    limits = sys.argv[1:] or ["default", "32", "64", "100"]
    reps = 30
    print("device:", jax.devices()[0], flush=True)

    for name, b, l, d, h in SHAPES:
        rng = np.random.default_rng(0)
        f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.02,
                                   jnp.bfloat16)
        x = f(b, l, d)
        ls, lb = jnp.ones((d,), jnp.bfloat16), jnp.zeros((d,), jnp.bfloat16)
        wqkv, bqkv, wout, bout = f(d, 3 * d), f(3 * d), f(d, d), f(d)
        w = (ls, lb, wqkv, bqkv, wout, bout)

        def timed(fn):
            # chain reps in a scan (bench.py methodology) so per-call
            # dispatch noise cancels; take best-of-3 timings
            def chained(x0):
                def body(c, _):
                    return fn(c, *w), ()
                out, _ = jax.lax.scan(body, x0, jnp.arange(reps))
                return out
            g = jax.jit(chained)
            np.asarray(g(x))  # warm/compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(g(x))
                best = min(best, time.perf_counter() - t0)
            return best / reps * 1e3

        tc = timed(lambda c, *a: fab._reference_chain(c, *a, num_heads=h,
                                                      eps=1e-5))
        est = (fab._vmem_estimate_padded(l, d, h * fab.head_pad(d, h))
               if d // h in fab._HEAD_PAD else fab._vmem_estimate(l, d))
        print(f"== {name}: est {est/2**20:.1f} MiB  "
              f"xla-chain {tc:.3f} ms", flush=True)
        for lim in limits:
            os.environ["XTAG_VMEM_LIMIT_MB"] = lim
            try:
                # fresh closure per limit -> fresh jit cache entry; the env
                # is read at trace time by _compiler_params()
                tf = timed(
                    lambda c, *a: fab.fused_attn_half(c, *a, num_heads=h))
                print(f"   limit {lim:>7}: fused {tf:.3f} ms  "
                      f"speedup {tc/tf:.3f}x", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"   limit {lim:>7}: CRASH {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
        os.environ.pop("XTAG_VMEM_LIMIT_MB", None)


if __name__ == "__main__":
    main()
