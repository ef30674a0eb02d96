"""FSDP (ZeRO-3 via GSPMD) parameter/optimizer-state sharding.

TPU-native extension with no reference analogue (the reference is DP-only,
distributed.py:93-195): `--fsdp` shards each large kernel — and therefore its
Adam moments — over the 'data' mesh axis. GSPMD inserts the all-gathers and
reduce-scatters. These tests assert (1) the memory claim: each device holds
1/N of the big kernels; (2) the semantics claim: one FSDP train step produces
the same loss and the same updated params as the replicated-DP step.
"""

import json
import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xtagclip_tpu.core.mesh import DATA_AXIS, create_mesh
from xtagclip_tpu.factory import add_model_config, create_model
from xtagclip_tpu.parallel.sharding import (
    infer_param_shardings,
    shard_batch,
    shard_params,
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
    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix="tinyfsdp-",
                                     delete=False) as f:
        json.dump(CFG, f)
        path = f.name
    add_model_config(path)
    return create_model(os.path.basename(path)[:-5])


def _batch(b=16):
    rng = np.random.default_rng(7)
    return {
        "images": rng.standard_normal((b, 32, 32, 3), dtype=np.float32),
        "texts": rng.integers(1, 1023, size=(b, 16)).astype(np.int32),
    }


def _run_one_step(bundle, mesh, fsdp):
    params = shard_params(bundle.params, mesh, fsdp=fsdp)
    tx = make_optimizer(cosine_lr(1e-3, 2, 10), params=params,
                        weight_decay=0.1)
    state = create_train_state(params, tx)
    batch = shard_batch(_batch(), mesh)
    step = make_train_step(bundle.module, tx, {"use_tagging_loss": False},
                           donate=False)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") \
            else mesh:
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
    return state, float(metrics["loss"])


def test_fsdp_shards_large_params_one_over_n(bundle):
    mesh = create_mesh()
    n = mesh.shape[DATA_AXIS]
    shardings = infer_param_shardings(bundle.params, mesh, fsdp=True)
    placed = jax.device_put(bundle.params, shardings)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(placed)[0]
    }
    big = {k: v for k, v in flat.items()
           if v.ndim >= 2 and v.size >= 2 ** 16}
    assert big, "tiny config unexpectedly has no large kernels"
    for name, leaf in big.items():
        shard = leaf.addressable_shards[0].data
        assert shard.size * n == leaf.size, (
            f"{name}: shard {shard.shape} is not 1/{n} of {leaf.shape}")
    # small leaves (biases, LN scales) stay replicated
    small = [v for v in flat.values() if v.ndim == 1]
    assert all(v.addressable_shards[0].data.size == v.size for v in small)


def test_fsdp_step_matches_replicated_dp(bundle):
    mesh = create_mesh()
    state_dp, loss_dp = _run_one_step(bundle, mesh, fsdp=False)
    state_fs, loss_fs = _run_one_step(bundle, mesh, fsdp=True)
    assert np.isfinite(loss_fs)
    np.testing.assert_allclose(loss_fs, loss_dp, rtol=2e-5)
    a = jax.tree_util.tree_leaves(state_dp.params)
    b = jax.tree_util.tree_leaves(state_fs.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(jax.device_get(y), np.float32),
            rtol=2e-4, atol=2e-5)


def test_fsdp_composes_with_model_axis(bundle):
    mesh = create_mesh(data_parallel=4, model_parallel=2)
    _, loss = _run_one_step(bundle, mesh, fsdp=True)
    assert np.isfinite(loss)


def test_fsdp_optimizer_state_inherits_sharding(bundle):
    mesh = create_mesh()
    n = mesh.shape[DATA_AXIS]
    params = shard_params(bundle.params, mesh, fsdp=True)
    tx = make_optimizer(cosine_lr(1e-3, 2, 10), params=params,
                        weight_decay=0.1)
    state = create_train_state(params, tx)
    # Adam mu/nu for the big kernels must be sharded like the params
    # (computation-follows-data at init, GSPMD keeps it through updates)
    leaves = [x for x in jax.tree_util.tree_leaves(state.opt_state)
              if hasattr(x, "addressable_shards") and x.ndim >= 2
              and x.size >= 2 ** 16]
    assert leaves, "no large optimizer-state leaves found"
    for leaf in leaves:
        assert leaf.addressable_shards[0].data.size * n == leaf.size


def test_fsdp_fits_vith_train_state_on_a_slice():
    """Analytic (eval_shape, zero allocation): ViT-H-14's train state — bf16
    params + 2 fp32 Adam moments — is ~10 GB and OOMs one 16-GB v5e chip
    once activations and double-buffering are added; under the FSDP rules on
    an 8-chip slice the per-chip share must drop below 2 GB."""
    import jax.numpy as jnp

    from xtagclip_tpu.factory import create_model
    from xtagclip_tpu.parallel.sharding import param_partition_spec

    bundle = create_model("ViT-H-14", skip_init=True)
    shapes = jax.eval_shape(
        lambda: bundle.module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 224, 224, 3), jnp.float32),
            text=jnp.zeros((1, 77), jnp.int32),
        )
    )["params"]
    n = 8
    total_b = sharded_b = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(shapes)[0]:
        # bf16 params + 2x fp32 moments = 10 bytes/param
        size = float(np.prod(leaf.shape)) * 10.0
        spec = param_partition_spec(path, leaf, model_size=1, fsdp_size=n)
        shards = n if any(ax == "data" for ax in spec) else 1
        total_b += size
        sharded_b += size / shards
    assert total_b > 9e9, f"ViT-H train state should be ~10 GB, got {total_b/1e9:.1f}"
    assert sharded_b < 2e9, (
        f"per-chip share {sharded_b/1e9:.2f} GB — FSDP rules leave too much "
        "replicated")
    # the replicated residue (biases, LN scales) must be a small fraction
    assert sharded_b < total_b / n * 1.35


@pytest.fixture()
def fresh_compile(tmp_path):
    """Route this test's compiles to a throwaway cache directory.

    XLA:CPU intermittently SIGABRTs when RELOADING the serialized
    executable of this particular program shape (GSPMD-sharded params +
    lax.scan over value_and_grad microbatches): the same test passes when
    the program is compiled in-process and can abort the whole pytest
    process when the executable comes back from the on-disk cache (the
    entry written by one green full-suite run reproducibly aborted every
    later run; an entry written by a standalone run loaded fine). A
    per-run tmp cache dir means reads always miss and nothing persists:
    deterministic fresh compilation, ~35 s. (Flipping
    jax_enable_compilation_cache instead is NOT reliable: is_cache_used
    latches per-process before the fixture runs.)
    """
    from jax._src import compilation_cache as cc

    old_dir = jax.config.jax_compilation_cache_dir
    cc.reset_cache()
    jax.config.update("jax_compilation_cache_dir", str(tmp_path / "cc"))
    yield
    cc.reset_cache()
    jax.config.update("jax_compilation_cache_dir", old_dir)


def test_fsdp_with_grad_accumulation(bundle, fresh_compile):
    """FSDP-sharded params + the accum replay step: the grad accumulator
    inherits the 1/N sharding (GSPMD), and the result matches the
    replicated-DP accum step."""
    from xtagclip_tpu.train.loop import make_accum_train_step

    mesh = create_mesh()
    rng = np.random.default_rng(3)
    accum, micro = 2, 8
    batch = {
        "images": rng.standard_normal((accum, micro, 32, 32, 3),
                                      dtype=np.float32),
        "texts": rng.integers(1, 1023, size=(accum, micro, 16)).astype(
            np.int32),
    }

    def run(fsdp):
        params = shard_params(bundle.params, mesh, fsdp=fsdp)
        tx = make_optimizer(cosine_lr(1e-3, 2, 10), params=params,
                            weight_decay=0.1)
        state = create_train_state(params, tx)
        sb = shard_batch(batch, mesh, accum=True)
        step = make_accum_train_step(bundle.module, tx,
                                     {"use_tagging_loss": False},
                                     accum_freq=accum, donate=False)
        with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") \
                else mesh:
            state, metrics = step(state, sb, jax.random.PRNGKey(0))
        return state, float(metrics["loss"])

    s_dp, l_dp = run(False)
    s_fs, l_fs = run(True)
    assert np.isfinite(l_fs)
    np.testing.assert_allclose(l_fs, l_dp, rtol=2e-5)
    for x, y in zip(jax.tree_util.tree_leaves(s_dp.params),
                    jax.tree_util.tree_leaves(s_fs.params)):
        np.testing.assert_allclose(
            np.asarray(x, np.float32),
            np.asarray(jax.device_get(y), np.float32),
            rtol=2e-4, atol=2e-5)
