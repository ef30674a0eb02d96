"""--use-bn-sync wiring: cross-replica BatchNorm statistics (reference
main_other.py:370-371 SyncBatchNorm equivalent).

Two execution modes are covered:
  * GSPMD (jit + batch sharded over the 'data' mesh axis): BatchNorm stats are
    computed over the global batch array by construction — sync-BN is the
    default semantics; the axis name stays unbound and must not crash.
  * shard_map (axis 'data' bound, per-shard batches): bn_axis_name='data'
    makes nn.BatchNorm pmean the per-shard statistics, matching the
    full-batch stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xtagclip_tpu.models.resnet import ModifiedResNet


def tiny_resnet(bn_axis_name=None):
    return ModifiedResNet(
        layers=(1, 1, 1, 1), output_dim=16, heads=2, image_size=32, width=8,
        bn_axis_name=bn_axis_name,
    )


def _batch_stats(model, params_vars, x):
    _, new_vars = model.apply(
        params_vars, x, deterministic=False, mutable=["batch_stats"]
    )
    return new_vars["batch_stats"]


def test_bn_sync_gspmd_matches_full_batch():
    """Sharded-batch GSPMD train forward produces the same batch_stats as the
    unsharded full-batch forward (the property DDP lacks without SyncBN)."""
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    model = tiny_resnet(bn_axis_name="data")  # flag ON; axis unbound under jit
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), x)

    ref_stats = _batch_stats(model, variables, x)

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    fn = jax.jit(
        lambda v, b: model.apply(v, b, deterministic=False,
                                 mutable=["batch_stats"])[1]["batch_stats"]
    )
    sharded_stats = fn(variables, xs)

    for a, b in zip(jax.tree_util.tree_leaves(ref_stats),
                    jax.tree_util.tree_leaves(sharded_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_bn_sync_shard_map_syncs_stats():
    """Under shard_map with per-shard different data, bn_axis_name='data'
    reproduces the full-batch statistics via pmean."""
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    model = tiny_resnet(bn_axis_name="data")
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), x)  # init: axis unbound, OK

    ref_stats = _batch_stats(model, variables, x)

    def shard_fn(v, b):
        return model.apply(v, b, deterministic=False,
                           mutable=["batch_stats"])[1]["batch_stats"]

    fn = jax.jit(shard_map(
        shard_fn, mesh=mesh, in_specs=(P(), P("data")),
        out_specs=P(),  # synced stats are identical across shards
        check_vma=False,
    ))
    synced_stats = fn(variables, x)

    for a, b in zip(jax.tree_util.tree_leaves(ref_stats),
                    jax.tree_util.tree_leaves(synced_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_factory_plumbs_use_bn_sync():
    from xtagclip_tpu.factory import create_model

    bundle = create_model("RN50", use_bn_sync=True, skip_init=True)
    assert bundle.module.visual.bn_axis_name == "data"
    bundle = create_model("RN50", skip_init=True)
    assert bundle.module.visual.bn_axis_name is None


def test_lock_image_freeze_bn_stats():
    """--lock-image-freeze-bn-stats: the image tower's BN running statistics
    must not change across a train step (reference utils.py:11-49)."""
    import json
    import os
    import tempfile

    from xtagclip_tpu.factory import add_model_config, create_model
    from xtagclip_tpu.train.loop import make_train_step
    from xtagclip_tpu.train.scheduler import cosine_lr
    from xtagclip_tpu.train.train_state import (
        create_train_state,
        make_optimizer,
    )

    cfg = dict(
        embed_dim=32,
        vision_cfg=dict(layers=[1, 1, 1, 1], width=16, image_size=32),
        text_cfg=dict(context_length=16, vocab_size=100, width=32, heads=2,
                      layers=1),
    )
    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix="tinybn-",
                                     delete=False) as f:
        json.dump(cfg, f)
        path = f.name
    add_model_config(path)
    bundle = create_model(os.path.basename(path)[:-5])
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.standard_normal((8, 32, 32, 3), dtype=np.float32),
        "texts": rng.integers(1, 99, size=(8, 16)).astype(np.int32),
    }
    tx = make_optimizer(cosine_lr(1e-3, 2, 50), params=bundle.params)

    def run(freeze):
        state = create_train_state(bundle.params, tx,
                                   extra_vars=bundle.extra_variables)
        step = make_train_step(
            bundle.module, tx,
            {"lock_image_freeze_bn_stats": freeze}, donate=False)
        state, _ = step(state, batch, jax.random.PRNGKey(0))
        return state.extra_vars["batch_stats"]["visual"]

    before = bundle.extra_variables["batch_stats"]["visual"]
    frozen = run(True)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(frozen)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    live = run(False)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(live)))
    assert changed

    # The frozen tower must also NORMALIZE with the running statistics during
    # a train-mode forward (reference FrozenBatchNorm2d, utils.py:11-49), not
    # merely discard the stat update: a train-mode forward with
    # visual_deterministic=True must equal the eval-mode forward.
    variables = {"params": bundle.params, **bundle.extra_variables}
    frozen_out = bundle.module.apply(
        variables, batch["images"], text=batch["texts"],
        deterministic=False, visual_deterministic=True,
        rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
    )[0]
    eval_out = bundle.module.apply(
        variables, batch["images"], text=batch["texts"], deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(frozen_out["image_features"]),
        np.asarray(eval_out["image_features"]), atol=1e-6)
