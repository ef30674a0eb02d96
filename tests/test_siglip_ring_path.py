"""The SigLIP ppermute ring runs in the EXECUTED train path (round-2 VERDICT
item 6): with a multi-device mesh, make_train_step's loss region is
shard_map'ped over the data axis, so the ring is a real collective-permute in
the lowered step — asserted on the compiled HLO — and the loss equals the
single-device global-matrix computation (reference loss.py:226-311 neighbour
exchange; 'shift' ring)."""

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtagclip_tpu.core.mesh import batch_sharding, create_mesh
from xtagclip_tpu.factory import add_model_config, create_model
from xtagclip_tpu.train.loop import make_train_step
from xtagclip_tpu.train.scheduler import cosine_lr
from xtagclip_tpu.train.train_state import create_train_state, make_optimizer

pytestmark = pytest.mark.e2e

CFG = dict(
    embed_dim=32,
    vision_cfg=dict(layers=1, width=32, head_width=16, patch_size=8,
                    image_size=16),
    text_cfg=dict(context_length=12, vocab_size=120, width=32, heads=2,
                  layers=1),
    init_logit_bias=-10.0,
)


@pytest.fixture(scope="module")
def setup():
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     prefix="tiny-siglip-",
                                     delete=False) as f:
        json.dump(CFG, f)
        path = f.name
    add_model_config(path)
    name = os.path.basename(path)[:-5]
    bundle = create_model(name)
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.standard_normal((16, 16, 16, 3), dtype=np.float32),
        "texts": rng.integers(1, 119, size=(16, 12)).astype(np.int32),
    }
    tx = make_optimizer(cosine_lr(1e-3, 2, 50), params=bundle.params)
    return bundle, batch, tx


def _run(bundle, batch, tx, mesh):
    state = create_train_state(bundle.params, tx)
    step = make_train_step(bundle.module, tx, {"siglip": True}, donate=False,
                           mesh=mesh)
    if mesh is not None:
        sharded = {k: jax.device_put(v, batch_sharding(mesh))
                   for k, v in batch.items()}
    else:
        sharded = batch
    new_state, metrics = step(state, sharded, jax.random.PRNGKey(0))
    lowered = jax.jit(
        lambda s, b, r: step(s, b, r)
    ).lower(state, sharded, jax.random.PRNGKey(0))
    return new_state, metrics, lowered.compile().as_text()


def test_ring_in_hlo_and_loss_equivalence(setup):
    bundle, batch, tx = setup
    assert len(jax.devices()) >= 8, "conftest forces the 8-device CPU mesh"
    mesh = create_mesh()
    assert mesh.shape["data"] > 1

    _, m_mesh, hlo = _run(bundle, batch, tx, mesh)
    assert "collective-permute" in hlo, (
        "siglip ring did not lower to a collective-permute on the mesh")

    _, m_single, _ = _run(bundle, batch, tx, None)
    np.testing.assert_allclose(
        float(m_mesh["contrastive_loss"]), float(m_single["contrastive_loss"]),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(m_mesh["loss"]), float(m_single["loss"]), rtol=1e-5)


def test_param_grads_match_single_device(setup):
    """One full optimizer step on the ring path must produce the same params
    as the unsharded path (grads flow through ppermute correctly)."""
    bundle, batch, tx = setup
    mesh = create_mesh()
    s_mesh, _, _ = _run(bundle, batch, tx, mesh)
    s_one, _, _ = _run(bundle, batch, tx, None)
    a = jax.tree_util.tree_leaves(s_mesh.params)
    b = jax.tree_util.tree_leaves(s_one.params)
    # AdamW normalizes grads, amplifying float reduction-order noise up to
    # the lr scale (5e-4 here) — 1e-4 still catches any real ring-grad bug
    # (a wrong ring produces O(lr) divergence on most params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)


def test_ragged_final_batch_falls_back_replicated(setup):
    """A final batch not divisible by the data axis (trainer.py leaves it
    replicated, no drop_last) must not crash the shard_map ring path — it
    falls back to the global-matrix loss with the same value."""
    bundle, batch, tx = setup
    mesh = create_mesh()
    ragged = {k: v[:12] for k, v in batch.items()}  # 12 % 8 != 0
    state = create_train_state(bundle.params, tx)
    step = make_train_step(bundle.module, tx, {"siglip": True}, donate=False,
                           mesh=mesh)
    _, m_mesh = step(state, ragged, jax.random.PRNGKey(0))

    step1 = make_train_step(bundle.module, tx, {"siglip": True}, donate=False,
                            mesh=None)
    _, m_one = step1(state, ragged, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(m_mesh["contrastive_loss"]), float(m_one["contrastive_loss"]),
        rtol=1e-5)
