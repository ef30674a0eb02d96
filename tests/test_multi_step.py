"""make_multi_step: K scanned optimizer steps must match K sequential steps."""

import json
import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xtagclip_tpu.factory import add_model_config, create_model
from xtagclip_tpu.train.loop import make_multi_step, make_train_step
from xtagclip_tpu.train.scheduler import cosine_lr
from xtagclip_tpu.train.train_state import create_train_state, make_optimizer

pytestmark = pytest.mark.e2e

CFG = dict(
    embed_dim=64,
    vision_cfg=dict(layers=2, width=64, head_width=32, patch_size=16,
                    image_size=32),
    text_cfg=dict(context_length=8, vocab_size=100, width=64, heads=2,
                  layers=2),
)


def test_multi_step_matches_sequential(rng):
    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix="tinyms-",
                                     delete=False) as f:
        json.dump(CFG, f)
        p = f.name
    add_model_config(p)
    bundle = create_model(os.path.basename(p)[:-5])

    K, B = 3, 4
    batches = {
        "images": rng.standard_normal((K, B, 32, 32, 3), dtype=np.float32),
        "texts": rng.integers(1, 99, size=(K, B, 8)).astype(np.int32),
    }
    sched = cosine_lr(1e-3, 1, 100)
    tx = make_optimizer(sched, params=bundle.params)
    cfg = {"use_tagging_loss": False}

    # multi donates its state; give it a copy so bundle.params stays alive
    params_copy = jax.tree.map(lambda x: jnp.array(x, copy=True), bundle.params)
    state_m = create_train_state(params_copy, tx)
    multi = make_multi_step(bundle.module, tx, cfg, K)
    rng_key = jax.random.PRNGKey(0)
    state_m, metrics = multi(state_m, batches, rng_key)
    assert metrics["loss"].shape == (K,)
    assert int(state_m.step) == K

    # sequential with the same per-step rngs
    state_s = create_train_state(bundle.params, tx)
    step = make_train_step(bundle.module, tx, cfg, donate=False)
    keys = jax.random.split(rng_key, K)
    for i in range(K):
        # make_train_step folds in state.step; multi uses pre-split keys.
        # dropout is inactive here (deterministic=False but all dropout rates
        # are 0 in these towers), so rng choice does not affect outputs.
        one = {k: v[i] for k, v in batches.items()}
        state_s, m = step(state_s, one, keys[i])

    a = jax.tree_util.tree_leaves(state_m.params)
    b = jax.tree_util.tree_leaves(state_s.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
