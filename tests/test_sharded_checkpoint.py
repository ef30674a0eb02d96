"""Sharded-checkpoint round trip on the 8-device mesh.

The first thing a real multi-chip run does after a preemption is restore a
sharded train state and continue (reference resume semantics
main_other.py:452-469, at the FSDP/TP scale this framework targets). These
tests save an FSDP+TP-sharded TrainState through train/checkpoint.py (orbax),
restore it into FRESHLY-inferred shardings in a new state tree, and assert
the continuation is step-identical to an uninterrupted run.
"""

import json
import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xtagclip_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, create_mesh
from xtagclip_tpu.factory import add_model_config, create_model
from xtagclip_tpu.parallel.sharding import shard_batch, shard_params
from xtagclip_tpu.train.checkpoint import (
    restore_train_state,
    save_train_state,
)
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


@pytest.fixture(scope="module")
def bundle():
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     prefix="tinyshckpt-", delete=False) as f:
        json.dump(CFG, f)
        path = f.name
    add_model_config(path)
    return create_model(os.path.basename(path)[:-5])


def _batch(seed, b=16):
    rng = np.random.default_rng(seed)
    return {
        "images": rng.standard_normal((b, 32, 32, 3), dtype=np.float32),
        "texts": rng.integers(1, 1023, size=(b, 16)).astype(np.int32),
    }


def _fresh(bundle, mesh):
    """Freshly sharded state + step fn, as a cold-started process builds."""
    params = shard_params(bundle.params, mesh, fsdp=True)
    tx = make_optimizer(cosine_lr(1e-3, 2, 10), params=params,
                        weight_decay=0.1)
    state = create_train_state(params, tx)
    step = make_train_step(bundle.module, tx, {"use_tagging_loss": False},
                           donate=False)
    return state, step


def _run(state, step, mesh, n, start=0):
    ctx = (jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh")
           else mesh)
    with ctx:
        for i in range(start, start + n):
            state, metrics = step(state, shard_batch(_batch(seed=i), mesh),
                                  jax.random.PRNGKey(i))
    return state, metrics


def _abstract_like(tree, mesh):
    """Restore template: shapes/dtypes/SHARDINGS from a fresh state tree —
    nothing is taken from the checkpoint beyond the values. Leaves the
    cold-start created off-mesh (e.g. the step counter, initialized before
    any jit ran) get an explicit replicated NamedSharding so the restored
    state is consistently mesh-placed."""
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())

    def leaf(x):
        if not isinstance(x, jax.Array):
            return x
        sh = x.sharding
        if not isinstance(sh, NamedSharding):
            sh = rep
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)

    return jax.tree_util.tree_map(leaf, tree)


def test_fsdp_tp_round_trip_step_identical(bundle, tmp_path):
    mesh = create_mesh(data_parallel=4, model_parallel=2)
    assert mesh.shape[DATA_AXIS] == 4 and mesh.shape[MODEL_AXIS] == 2

    # uninterrupted: two steps straight through
    state0, step = _fresh(bundle, mesh)
    ref, _ = _run(state0, step, mesh, n=2)

    # interrupted: one step, save the SHARDED state (no host gather), then
    # restore into a brand-new state's inferred shardings and continue
    state0b, _ = _fresh(bundle, mesh)
    mid, _ = _run(state0b, step, mesh, n=1)
    save_train_state(str(tmp_path), "epoch_0", {"state": mid, "epoch": 0})

    fresh_state, step2 = _fresh(bundle, mesh)
    template = {"state": _abstract_like(fresh_state, mesh), "epoch": 0}
    restored = restore_train_state(str(tmp_path), "epoch_0", template)
    assert restored["epoch"] == 0
    rstate = restored["state"]

    # restored leaves live on-device with the inferred shardings
    some_kernel = rstate.params["visual"]["transformer"]["resblocks_0"][
        "mlp"]["c_fc"]["kernel"]
    assert isinstance(some_kernel, jax.Array)
    n_data = mesh.shape[DATA_AXIS]
    assert (some_kernel.addressable_shards[0].data.size * n_data
            <= some_kernel.size), "FSDP kernel came back unsharded"

    out, _ = _run(rstate, step2, mesh, n=1, start=1)
    assert int(out.step) == int(ref.step) == 2
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref.params),
        jax.tree_util.tree_leaves_with_path(out.params),
    ):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(a), np.float32),
            np.asarray(jax.device_get(b), np.float32),
            err_msg=jax.tree_util.keystr(pa),
        )
    # optimizer moments continue identically too
    for a, b in zip(jax.tree_util.tree_leaves(ref.opt_state),
                    jax.tree_util.tree_leaves(out.opt_state)):
        np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                      np.asarray(jax.device_get(b)))


def test_sharded_save_restores_on_plain_dp_mesh(bundle, tmp_path):
    """A state saved on the 4x2 FSDP+TP mesh restores into an 8-way
    data-parallel mesh's shardings — resharding across mesh geometries is
    exactly what orbax + the template contract must handle after a resize."""
    mesh42 = create_mesh(data_parallel=4, model_parallel=2)
    state, step = _fresh(bundle, mesh42)
    mid, _ = _run(state, step, mesh42, n=1)
    save_train_state(str(tmp_path), "latest", {"state": mid, "epoch": 0})

    mesh8 = create_mesh()  # 8-way data axis
    fresh_state, step8 = _fresh(bundle, mesh8)
    restored = restore_train_state(
        str(tmp_path), "latest",
        {"state": _abstract_like(fresh_state, mesh8), "epoch": 0})
    out, metrics = _run(restored["state"], step8, mesh8, n=1, start=1)
    assert np.isfinite(float(metrics["loss"]))
    assert int(out.step) == 2
