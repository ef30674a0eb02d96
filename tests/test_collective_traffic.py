"""The emitted collective traffic matches the PERF.md ICI model.

PERF.md's scaling analysis rests on two claims about what GSPMD emits for
our sharding rules: (1) replicated-DP all-reduces ~= the full gradient
bytes, (2) --fsdp replaces that with param all-gathers while the grad
all-reduce shrinks to the unsharded residue. Rather than trust the
analysis, these tests parse the compiled multi-device HLO and account the
collective bytes op by op.

Notes pinned by exploration (XLA:CPU, 8-device mesh):
- only TOUCHED params produce gradient traffic — the tag loss must be on,
  or the always-built tag head contributes zero-grads that XLA folds away;
- XLA:CPU expresses the sharded-grad reduction via all-reduce +
  all-to-all rather than a literal reduce-scatter, so the FSDP assertion
  is on the all-reduce SHRINKING and all-gathers APPEARING.
"""

import json
import os
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xtagclip_tpu.core.mesh import create_mesh
from xtagclip_tpu.factory import add_model_config, create_model
from xtagclip_tpu.models.clip import num_combos
from xtagclip_tpu.parallel.sharding import shard_batch, shard_params
from xtagclip_tpu.train.loop import make_train_step
from xtagclip_tpu.train.scheduler import cosine_lr
from xtagclip_tpu.train.train_state import create_train_state, make_optimizer

pytestmark = pytest.mark.e2e

CFG = dict(
    embed_dim=256,
    vision_cfg=dict(layers=2, width=256, head_width=64, patch_size=8,
                    image_size=32),
    text_cfg=dict(context_length=16, vocab_size=1024, width=256, heads=4,
                  layers=2),
)

_DT = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f64": 8,
       "pred": 1, "s8": 1, "u8": 1}


def collective_bytes(hlo: str) -> dict:
    """{op: (count, result_bytes)} over the compiled HLO text."""
    out = {}
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        total, cnt = 0, 0
        pat = rf"= (\([^)]*\)|[a-z0-9]+\[[^\]]*\][^ ]*) {re.escape(op)}(-start)?\("
        for m in re.finditer(pat, hlo):
            cnt += 1
            for dt, dims in re.findall(
                    r"(f32|bf16|f16|s32|u32|f64|pred|s8|u8)\[([0-9,]*)\]",
                    m.group(1)):
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                total += n * _DT[dt]
        out[op] = (cnt, total)
    return out


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = tmp_path_factory.mktemp("cfg") / "colltr-tiny.json"
    path.write_text(json.dumps(CFG))
    add_model_config(str(path))
    bundle = create_model(path.stem, use_tagging=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(1, 1000, size=(1, 3, num_combos(), 16)).astype(np.int32))
    batch = {
        "images": rng.standard_normal((16, 32, 32, 3), dtype=np.float32),
        "texts": rng.integers(1, 1023, size=(16, 16)).astype(np.int32),
        "additional": (rng.random((16, 22)) > 0.5).astype(np.float32),
        "class_ids": rng.integers(0, 3, size=(16,)).astype(np.int32),
    }
    param_bytes = sum(int(np.prod(l.shape)) * 4
                      for l in jax.tree.leaves(bundle.params))
    return bundle, table, batch, param_bytes


def _lowered_hlo(bundle, table, batch, fsdp):
    mesh = create_mesh()
    params = shard_params(bundle.params, mesh, fsdp=fsdp)
    tx = make_optimizer(cosine_lr(1e-3, 2, 10), params=params,
                        weight_decay=0.1)
    state = create_train_state(params, tx)
    sb = shard_batch(batch, mesh)
    step = make_train_step(bundle.module, tx, {"use_tagging_loss": True},
                           prompt_table=table, donate=False)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") \
            else mesh:
        return jax.jit(lambda s, b, r: step(s, b, r)).lower(
            state, sb, jax.random.PRNGKey(0)).compile().as_text()


def test_dp_allreduce_bytes_equal_grad_bytes(setup):
    bundle, table, batch, P = setup
    stats = collective_bytes(_lowered_hlo(bundle, table, batch, fsdp=False))
    ar = stats["all-reduce"][1]
    # every touched fp32 gradient is all-reduced exactly once (+ loss
    # scalars); the tag loss keeps the whole tree touched
    assert 0.9 * P <= ar <= 1.3 * P, (
        f"DP all-reduce {ar/1e6:.1f} MB vs params {P/1e6:.1f} MB")
    # replicated DP gathers nothing of consequence
    assert stats["all-gather"][1] < 0.05 * P


def test_fsdp_swaps_allreduce_for_allgather(setup):
    bundle, table, batch, P = setup
    stats = collective_bytes(_lowered_hlo(bundle, table, batch, fsdp=True))
    ar = stats["all-reduce"][1]
    ag = stats["all-gather"][1]
    resharded = ag + stats["all-to-all"][1] + stats["reduce-scatter"][1]
    # the sharded kernels' grads no longer ride the full-size all-reduce
    assert ar < 0.5 * P, (
        f"FSDP all-reduce {ar/1e6:.1f} MB did not shrink (P {P/1e6:.1f} MB)")
    # ...and their parameters are gathered for compute instead
    assert resharded > 0.3 * P, (
        f"FSDP gather/reshard traffic {resharded/1e6:.1f} MB too small")


def test_tp_mesh_emits_both_axis_collectives(setup):
    """data x model (4x2) mesh: tensor-parallel activation collectives ride
    the model axis (groups [4,2]<=[8]: pairs sharing a data index) while the
    gradient all-reduce rides the data axis (groups [2,4]<=[4,2]T(1,0))."""
    bundle, table, batch, P = setup
    mesh = create_mesh(data_parallel=4, model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    params = shard_params(bundle.params, mesh, fsdp=False)
    tx = make_optimizer(cosine_lr(1e-3, 2, 10), params=params,
                        weight_decay=0.1)
    state = create_train_state(params, tx)
    sb = shard_batch(batch, mesh)
    step = make_train_step(bundle.module, tx, {"use_tagging_loss": True},
                           prompt_table=table, donate=False)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") \
            else mesh:
        hlo = jax.jit(lambda s, b, r: step(s, b, r)).lower(
            state, sb, jax.random.PRNGKey(0)).compile().as_text()

    model_axis = re.findall(
        r"(all-reduce|all-gather|all-to-all)(?:-start)?\([^;]*?"
        r"replica_groups=\[4,2\]<=\[8\]", hlo)
    data_axis = re.findall(
        r"(all-reduce|all-gather|all-to-all)(?:-start)?\([^;]*?"
        r"replica_groups=\[2,4\]<=\[4,2\]T\(1,0\)", hlo)
    assert len(model_axis) > 10, (
        f"expected tensor-parallel model-axis collectives, got {model_axis}")
    assert "all-reduce" in data_axis, (
        f"gradient all-reduce over the data axis missing: {data_axis}")
