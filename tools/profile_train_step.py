"""On-chip op-level breakdown of the ViT-B-32 contrastive train step.

The tb=128 stage decomposition (tools/probe_train_batch.py --decompose)
shows fwd 12 ms (~80% MFU) but fwd+bwd 66 ms — the backward runs at ~35%
MFU and is the whole train-MFU story. This probe answers WHERE the
backward's time goes: it captures a jax.profiler trace of one warm
make_multi_step call and prints the top device ops by total self time
from the chrome-trace events (no TensorBoard needed).

Run: python tools/profile_train_step.py [tb]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xtagclip_tpu.factory import create_model
    from xtagclip_tpu.ops.preprocess import normalize_images
    from xtagclip_tpu.train.loop import make_multi_step
    from xtagclip_tpu.train.scheduler import cosine_lr
    from xtagclip_tpu.train.train_state import (
        create_train_state,
        make_optimizer,
    )

    tb = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dev = jax.devices()[0]
    print("device:", dev, " tb:", tb)
    bundle = create_model("ViT-B-32", precision="bf16", skip_init=True)
    module = bundle.module
    ctx = bundle.model_cfg["text_cfg"].get("context_length", 77)
    with jax.default_device(dev):
        variables = jax.jit(
            module.init, static_argnames=("deterministic",))(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.bfloat16),
            jnp.zeros((1, ctx), jnp.int32), deterministic=True)
    params = variables["params"]
    rng = np.random.default_rng(0)
    tx = make_optimizer(cosine_lr(1e-4, 10, 1000), params=params,
                        weight_decay=0.1)
    state = create_train_state(params, tx)
    KT = 4
    texts = jnp.asarray(rng.integers(1, 49407, size=(KT, tb, ctx)), jnp.int32)
    imgs_f = normalize_images(
        jax.device_put(rng.integers(0, 256, size=(KT, tb, 224, 224, 3))
                       .astype(np.uint8), dev), dtype=jnp.bfloat16)
    batches = {"images": imgs_f, "texts": texts}
    step_fn = make_multi_step(module, tx, {"use_tagging_loss": False},
                              num_steps=KT, donate=False)
    for i in range(2):
        state, m = step_fn(state, batches, jax.random.PRNGKey(i))
        np.asarray(m["loss"])

    tdir = tempfile.mkdtemp(prefix="xtag_trace_")
    with jax.profiler.trace(tdir):
        state, m = step_fn(state, batches, jax.random.PRNGKey(9))
        np.asarray(m["loss"])

    files = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace written under", tdir)
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)

    # Chrome-trace: pick the TPU device PIDs (process_name != python
    # threads), sum complete events ("X") by op name.
    pid_name = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower()}
    # Leaf HLO ops only: module-level spans (jit_*, while.*, bare ids)
    # nest every leaf and would double-count. Group families by stripping
    # the ".NNN" instance suffix so 12 per-layer clones of one fusion
    # aggregate into one row.
    import re

    wrapper = re.compile(r"^(jit_|while[.\d]|body|condition|\d+$)")
    fam = re.compile(r"[.\d]+$")
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        if wrapper.match(name):
            continue
        name = fam.sub("", name)
        tot[name] += ev.get("dur", 0.0)
        cnt[name] += 1
    if not tot:
        print("no device events; pids:", pid_name)
        return
    total_us = sum(tot.values())
    print(f"\n{len(tot)} op families, "
          f"{total_us/1e3:.1f} ms leaf total over {KT} steps "
          f"({total_us/1e3/KT:.1f} ms/step busy)")
    print(f"{'us/step':>10}  {'%':>5}  {'n':>5}  op family")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{us/KT:10.0f}  {100*us/total_us:5.1f}  {cnt[name]:5d}  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
